from . import attentions  # noqa: F401  (registers ATTENTIONS)
from . import losses  # noqa: F401  (registers LOSSES)
from . import baselines  # noqa: F401  (registers baseline SUBMODULES)
from . import controlnet  # noqa: F401  (registers ControlT2MHalf variants)
from . import vae_actor  # noqa: F401  (registers VAE/ACTOR/InterCLIP)
from .architecture import MotionDiffusion  # noqa: F401
from .stmogen import PoseDecoder, PoseEncoder, STMoGenTransformer  # noqa: F401
from .text_encoder import ClipTextModel, TextEncoder  # noqa: F401
from .tokenizer import tokenize  # noqa: F401
