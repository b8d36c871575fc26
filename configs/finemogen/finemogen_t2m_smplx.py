# FineMoGen on Motion-X SMPL-X 322-d (reference
# configs/finemogen/finemogen_t2m_smplx.py): motionx layout, 12 part heads
_base_ = ['../_base_/datasets/motionx_bs128.py']
optimizer = dict(type='Adam', lr=2e-4)
lr_config = dict(policy='step', step=[10])
runner = dict(type='EpochBasedRunner', max_epochs=24)
latent_dim = 64
num_heads = 12
model = dict(type='MotionDiffusion',
             model=dict(type='FineMoGenTransformer', input_feats=322,
                        max_seq_len=196, latent_dim=latent_dim * num_heads,
                        time_embed_dim=2048, num_layers=4,
                        ca_block_cfg=dict(type='SAMI', latent_dim=latent_dim,
                                          text_latent_dim=256,
                                          num_heads=num_heads, num_text_heads=1,
                                          num_experts=16, topk=2,
                                          gate_type='cosine_top', gate_noise=1.0,
                                          ffn_dim=512, time_embed_dim=2048,
                                          max_seq_len=196, max_text_seq_len=77,
                                          temporal_comb=False, dropout=0),
                        ffn_cfg=dict(latent_dim=latent_dim, ffn_dim=512, dropout=0,
                                     time_embed_dim=2048, num_heads=num_heads),
                        text_encoder=dict(pretrained_model='clip', latent_dim=256,
                                          num_layers=2, ff_size=2048, dropout=0,
                                          use_text_proj=False),
                        pose_encoder_cfg=dict(dataset_name='motionx',
                                              latent_dim=latent_dim, input_dim=322),
                        pose_decoder_cfg=dict(dataset_name='motionx',
                                              latent_dim=latent_dim, output_dim=322),
                        scale_func_cfg=dict(scale=6.5),
                        moe_route_loss_weight=10.0,
                        template_kl_loss_weight=0.0001),
             loss_recon=dict(type='MSELoss', loss_weight=1, reduction='none'),
             diffusion_train=dict(beta_scheduler='linear', diffusion_steps=1000,
                                  model_mean_type='start_x',
                                  model_var_type='fixed_large'),
             diffusion_test=dict(beta_scheduler='linear', diffusion_steps=1000,
                                 model_mean_type='start_x',
                                 model_var_type='fixed_large',
                                 respace='15,15,8,6,6'),
             inference_type='ddim',
             loss_reduction='frame')
data = dict(samples_per_gpu=128,
            train=dict(dataset=dict(ann_file='humanml3d_align_train_val.txt')))
