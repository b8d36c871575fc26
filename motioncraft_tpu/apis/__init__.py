from .factory import (build_flagship, flagship_t2m_cfg, make_text_batch,
                      tiny_t2m_cfg)
from .train import make_train_step, set_random_seed, train_model
