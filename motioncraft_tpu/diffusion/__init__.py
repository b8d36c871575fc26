from .gaussian import (GaussianDiffusion, build_diffusion, create_diffusion,
                       model_timesteps, p_mean_variance, predict_eps_from_xstart,
                       predict_xstart_from_eps, q_posterior_mean_variance, q_sample,
                       training_losses)
from .sampling import (Outpainting, RepaintConfig, SampleResult, ddim_sample_loop,
                       ddim_sample_loop_harmonize, ddim_step, p_sample_loop, p_sample_step)
from .samplers import (LossSecondMomentResampler, ScheduleSampler, UniformSampler,
                       create_named_schedule_sampler)
from .schedules import (betas_for_alpha_bar, get_named_beta_schedule,
                        get_schedule_jump, get_schedule_jump_cjm_ddim,
                        get_schedule_jump_paper, space_timesteps)
from .stepcache import (StepCacheConfig, flags_from_errors, load_flags,
                        pattern_flags)
