from .server import MotionGenServer
