# FineMoGen on KIT-ML (reference configs/finemogen/finemogen_kit.py):
# kit_ml body layout (8 part heads), CFG scale 4.5
_base_ = ['../_base_/datasets/kit_ml_bs128.py']
optimizer = dict(type='Adam', lr=2e-4)
lr_config = dict(policy='step', step=[10])
runner = dict(type='EpochBasedRunner', max_epochs=12)
latent_dim = 64
num_heads = 8
model = dict(type='MotionDiffusion',
             model=dict(type='FineMoGenTransformer', input_feats=251,
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
                        pose_encoder_cfg=dict(dataset_name='kit_ml',
                                              latent_dim=latent_dim, input_dim=251),
                        pose_decoder_cfg=dict(dataset_name='kit_ml',
                                              latent_dim=latent_dim, output_dim=251),
                        scale_func_cfg=dict(scale=4.5),
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
