from .eval_hook import EvalHook
from .factory import (bf16_cast_variables, build_flagship, flagship_m2d_cfg,
                      flagship_s2g_cfg, flagship_t2m_cfg,
                      int8_quantize_variables, make_text_batch, tiny_t2m_cfg)
from .test import multi_host_test, single_device_test
from .train import make_train_step, set_random_seed, train_model
from .windowed import (denormalize, num_windows, windowed_sample,
                       windowed_sample_batch)
