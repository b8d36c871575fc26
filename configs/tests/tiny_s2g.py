# Tiny S2G smoke config
_base_ = ['./tiny_t2m.py']
latent_dim = 8
num_heads = 12
base_model = dict(type='STMoGenTransformer', input_feats=322, max_seq_len=16,
                  latent_dim=latent_dim * num_heads, time_embed_dim=32, num_layers=2,
                  ca_block_cfg=dict(type='STMA', latent_dim=latent_dim,
                                    text_latent_dim=16, num_heads=num_heads,
                                    num_text_heads=1, num_experts=4, topk=2,
                                    gate_type='cosine_top', gate_noise=1.0,
                                    ffn_dim=16, time_embed_dim=32, max_seq_len=16,
                                    max_text_seq_len=77, temporal_comb=False,
                                    dropout=0, dynamic_body=True),
                  ffn_cfg=dict(latent_dim=latent_dim, ffn_dim=16, dropout=0,
                               time_embed_dim=32, num_heads=num_heads),
                  text_encoder=dict(pretrained_model='clip', latent_dim=16,
                                    num_layers=1, ff_size=16, dropout=0,
                                    use_text_proj=False, clip_width=32, clip_layers=1),
                  pose_encoder_cfg=dict(dataset_name='motionx', latent_dim=latent_dim,
                                        input_dim=322),
                  pose_decoder_cfg=dict(dataset_name='motionx', latent_dim=latent_dim,
                                        output_dim=322),
                  scale_func_cfg=dict(scale=6.5), moe_route_loss_weight=10.0)
model = dict(model=dict(type='ControlT2MHalf', base_model=base_model,
                        copy_blocks_num=1, control_cond_feats=2,
                        condition_encode_cfg=dict(dataset_name='beats2',
                                                  condition_pre_encode=True,
                                                  condition_pre_encode_type='wav',
                                                  condition_latent_dim=16,
                                                  control_cond_feats=2,
                                                  condition_cfg=True),
                        # delete inherited STMoGen keys that ControlT2MHalf lacks
                        _delete_=True),
             type='MotionDiffusion',
             loss_recon=dict(type='MSELoss', loss_weight=1, reduction='none'),
             diffusion_train=dict(beta_scheduler='linear', diffusion_steps=1000,
                                  model_mean_type='start_x',
                                  model_var_type='fixed_large'),
             diffusion_test=dict(beta_scheduler='linear', diffusion_steps=1000,
                                 model_mean_type='start_x',
                                 model_var_type='fixed_large', respace='4'),
             inference_type='ddim', loss_reduction='batch',
             repaint=dict(overlap_len=4, same_overlap_noisy=False))
windowed = dict(window=16, pre_frames=4, pose_fps=30, audio_sr=16000)
# tiny evaluator for FID
eval_model = dict(type='T2MContrastiveModel_SMPLX',
                  motion_encoder=dict(nfeats=322, vae=True, num_layers=1,
                                      latent_dim=32, ff_size=32, num_heads=2),
                  text_encoder=dict(num_layers=1, latent_dim=32, ff_size=32,
                                    num_heads=2,
                                    bert_cfg=dict(dim=32, n_layers=1, n_heads=2,
                                                  hidden_dim=64)))
