# MotionDiffuse on Motion-X SMPL-X 322-d (reference
# configs/motiondiffuse/motiondiffuse_t2m_smplx.py)
_base_ = ['../_base_/datasets/motionx_bs128.py']
optimizer = dict(type='Adam', lr=2e-4)
lr_config = dict(policy='step', step=[10])
runner = dict(type='EpochBasedRunner', max_epochs=24)
latent_dim = 512
model = dict(type='MotionDiffusion',
             model=dict(type='MotionDiffuseTransformer', input_feats=322,
                        max_seq_len=196, latent_dim=latent_dim,
                        time_embed_dim=2048, num_layers=8,
                        sa_block_cfg=dict(type='EfficientSelfAttention',
                                          latent_dim=latent_dim, num_heads=8,
                                          dropout=0, time_embed_dim=2048),
                        ca_block_cfg=dict(type='EfficientCrossAttention',
                                          latent_dim=latent_dim,
                                          text_latent_dim=256, num_heads=8,
                                          dropout=0, time_embed_dim=2048),
                        ffn_cfg=dict(latent_dim=latent_dim, ffn_dim=1024,
                                     dropout=0, time_embed_dim=2048),
                        text_encoder=dict(pretrained_model='clip', latent_dim=256,
                                          num_layers=4, num_heads=4, ff_size=2048,
                                          dropout=0, use_text_proj=True)),
             loss_recon=dict(type='MSELoss', loss_weight=1, reduction='none'),
             diffusion_train=dict(beta_scheduler='linear', diffusion_steps=1000,
                                  model_mean_type='epsilon',
                                  model_var_type='fixed_small'),
             diffusion_test=dict(beta_scheduler='linear', diffusion_steps=1000,
                                 model_mean_type='epsilon',
                                 model_var_type='fixed_small'),
             inference_type='ddpm',
             loss_reduction='frame')
data = dict(samples_per_gpu=64,
            train=dict(dataset=dict(ann_file='humanml3d_align_train_val.txt')))
