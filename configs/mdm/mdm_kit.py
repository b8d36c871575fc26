# MDM on KIT-ML (reference configs/mdm/mdm_kit.py)
_base_ = ['../_base_/datasets/kit_ml_bs128.py']
checkpoint_config = dict(interval=50000)
optimizer = dict(type='Adam', lr=1e-4)
lr_config = dict(policy='fixed')
runner = dict(type='IterBasedRunner', max_iters=500000)
model = dict(type='MotionDiffusion',
             model=dict(type='MDMTransformer', input_feats=251, latent_dim=512,
                        ff_size=1024, num_layers=8, num_heads=4, dropout=0.1,
                        clip_dim=512, guide_scale=2.5, cond_mask_prob=0.1),
             loss_recon=dict(type='MSELoss', loss_weight=1, reduction='none'),
             diffusion_train=dict(beta_scheduler='cosine', diffusion_steps=1000,
                                  model_mean_type='start_x',
                                  model_var_type='fixed_small'),
             diffusion_test=dict(beta_scheduler='cosine', diffusion_steps=1000,
                                 model_mean_type='start_x',
                                 model_var_type='fixed_small'),
             inference_type='ddpm',
             loss_reduction='frame')
data = dict(samples_per_gpu=64)
