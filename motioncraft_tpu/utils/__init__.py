from .logger import get_root_logger
