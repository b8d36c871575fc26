# MDM on Motion-X SMPL-X 322-d (reference configs/mdm/mdm_t2m_smplx.py)
_base_ = ['../_base_/datasets/motionx_bs128.py']
checkpoint_config = dict(interval=3)
optimizer = dict(type='Adam', lr=1e-4)
lr_config = dict(policy='fixed')
runner = dict(type='EpochBasedRunner', max_epochs=24)
model = dict(type='MotionDiffusion',
             model=dict(type='MDMTransformer', input_feats=322, latent_dim=512,
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
data = dict(samples_per_gpu=768,
            train=dict(dataset=dict(ann_file='humanml3d_align_train_val.txt')))
