# Ground-truth-as-model metric sanity harness (reference configs/gt.py:
# inference_type='gt' runs the full data->evaluate pipeline with GT motions
# as predictions; FID floor ~0)
_base_ = ['./_base_/datasets/motionx_mix_bs128.py']
model = dict(type='MotionDiffusion',
             inference_type='gt',
             loss_recon=dict(type='MSELoss', loss_weight=1, reduction='none'),
             diffusion_train=dict(beta_scheduler='linear', diffusion_steps=1000,
                                  model_mean_type='start_x',
                                  model_var_type='fixed_large'),
             diffusion_test=dict(beta_scheduler='linear', diffusion_steps=1000,
                                 model_mean_type='start_x',
                                 model_var_type='fixed_large'))
