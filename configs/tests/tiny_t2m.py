# Tiny end-to-end config for CI / smoke drives (synthetic data under ./data_tiny)
data_keys = ['motion', 'motion_mask', 'motion_length']
meta_keys = ['text']
pipeline = [
    dict(type='Normalize', mean_path='./data_tiny/datasets/motionx/mean.npy',
         std_path='./data_tiny/datasets/motionx/std.npy'),
    dict(type='Crop', crop_size=16),
    dict(type='ToTensor', keys=data_keys[:2]),
    dict(type='Collect', keys=data_keys, meta_keys=meta_keys),
]
data = dict(
    samples_per_gpu=4,
    train=dict(type='TextMotionDataset', dataset_name='motionx',
               data_prefix='./data_tiny', pipeline=pipeline, ann_file='ann.txt',
               motion_dir='motions', text_dir='texts'),
    test=dict(type='TextMotionDataset', dataset_name='motionx',
              data_prefix='./data_tiny', pipeline=pipeline, ann_file='ann.txt',
              motion_dir='motions', text_dir='texts',
              eval_cfg=dict(
                  shuffle_indexes=True, replication_times=2,
                  replication_reduction='statistics',
                  evaluator_model=dict(
                      type='T2MContrastiveModel_SMPLX',
                      motion_encoder=dict(nfeats=322, vae=True, num_layers=1,
                                          latent_dim=32, ff_size=32, num_heads=2),
                      text_encoder=dict(num_layers=1, latent_dim=32, ff_size=32,
                                        num_heads=2,
                                        bert_cfg=dict(dim=32, n_layers=1, n_heads=2,
                                                      hidden_dim=64))),
                  metrics=[
                      dict(type='R Precision', batch_size=8, top_k=3),
                      dict(type='FID', emb_scale=1.0),
                  ]),
              test_mode=True),
)

latent_dim = 8
num_heads = 12
model = dict(type='MotionDiffusion',
             model=dict(type='STMoGenTransformer', input_feats=322, max_seq_len=16,
                        latent_dim=latent_dim * num_heads, time_embed_dim=32,
                        num_layers=1,
                        ca_block_cfg=dict(type='STMA', latent_dim=latent_dim,
                                          text_latent_dim=16, num_heads=num_heads,
                                          num_text_heads=1, num_experts=4, topk=2,
                                          gate_type='cosine_top', gate_noise=1.0,
                                          ffn_dim=16, time_embed_dim=32,
                                          max_seq_len=16, max_text_seq_len=77,
                                          temporal_comb=False, dropout=0,
                                          dynamic_body=True),
                        ffn_cfg=dict(latent_dim=latent_dim, ffn_dim=16, dropout=0,
                                     time_embed_dim=32, num_heads=num_heads),
                        text_encoder=dict(pretrained_model='clip', latent_dim=16,
                                          num_layers=1, ff_size=16, dropout=0,
                                          use_text_proj=False, clip_width=32,
                                          clip_layers=1),
                        pose_encoder_cfg=dict(dataset_name='motionx',
                                              latent_dim=latent_dim, input_dim=322),
                        pose_decoder_cfg=dict(dataset_name='motionx',
                                              latent_dim=latent_dim, output_dim=322),
                        scale_func_cfg=dict(scale=6.5),
                        moe_route_loss_weight=10.0),
             loss_recon=dict(type='MSELoss', loss_weight=1, reduction='none'),
             face_no_loss=True,
             diffusion_train=dict(beta_scheduler='linear', diffusion_steps=1000,
                                  model_mean_type='start_x',
                                  model_var_type='fixed_large'),
             diffusion_test=dict(beta_scheduler='linear', diffusion_steps=1000,
                                 model_mean_type='start_x',
                                 model_var_type='fixed_large', respace='4'),
             inference_type='ddim', loss_reduction='batch')
optimizer = dict(type='Adam', lr=2e-4)
lr_config = dict(policy='step', step=[10])
runner = dict(type='EpochBasedRunner', max_epochs=1)
log_config = dict(interval=2)
