# MCM ControlNet for S2G (reference configs/mcm/mcm_s2g_beats2.py:57-100)
_base_ = ['../_base_/datasets/beats2_bs128.py']
optimizer = dict(type='Adam', lr=2e-4)
lr_config = dict(policy='step', step=[10])
runner = dict(type='EpochBasedRunner', max_epochs=48)
latent_dim = 512
control_cond_feats = 2
base_model = dict(type='MCMTransformer', input_feats=322, max_seq_len=196,
                  latent_dim=latent_dim, time_embed_dim=2048, num_layers=8,
                  sa_block_cfg=dict(type='EfficientSelfAttention', latent_dim=196,
                                    num_heads=4, dropout=0, time_embed_dim=2048),
                  ca_block_cfg=dict(type='EfficientCrossAttention',
                                    latent_dim=latent_dim, text_latent_dim=256,
                                    num_heads=8, dropout=0, time_embed_dim=2048),
                  ffn_cfg=dict(latent_dim=latent_dim, ffn_dim=1024, dropout=0,
                               time_embed_dim=2048),
                  text_encoder=dict(pretrained_model='clip', latent_dim=256,
                                    num_layers=4, num_heads=4, ff_size=2048,
                                    dropout=0, use_text_proj=True))
model = dict(type='MotionDiffusion',
             model=dict(type='ControlT2MHalfMCM', base_model=base_model,
                        copy_blocks_num=2, control_cond_feats=control_cond_feats,
                        condition_encode_cfg=dict(dataset_name='beats2',
                                                  condition_pre_encode=True,
                                                  condition_pre_encode_type='wav',
                                                  control_cond_feats=control_cond_feats,
                                                  condition_latent_dim=latent_dim,
                                                  condition_cfg=True)),
             loss_recon=dict(type='MSELoss', loss_weight=1, reduction='none'),
             diffusion_train=dict(beta_scheduler='linear', diffusion_steps=1000,
                                  model_mean_type='epsilon',
                                  model_var_type='fixed_small'),
             diffusion_test=dict(beta_scheduler='linear', diffusion_steps=1000,
                                 model_mean_type='epsilon',
                                 model_var_type='fixed_small', respace='ddim50'),
             inference_type='ddim', loss_reduction='frame',
             repaint=dict(overlap_len=4))
windowed = dict(window=196, pre_frames=4, pose_fps=30, audio_sr=16000)
