# Protocol-scale GT metric-floor harness (reference configs/gt.py:45 +
# configs/_base_/datasets/motionx_mix_bs128.py:89-111 protocol counts):
# inference_type='gt' passes ~1k synthetic 196x322 clips through the full
# data -> evaluate pipeline at batch 32 / 20 shuffled replications.  With GT
# motions as predictions FID must be ~0 and, under the (untrained) synthetic
# evaluator, R-Precision must sit at chance (top-k ~= k/32).  Synthetic tree:
# tools/make_tiny_data.py --protocol-gt (never committed; ~250 MB).
data_keys = ['motion', 'motion_mask', 'motion_length']
meta_keys = ['text']
pipeline = [
    dict(type='Normalize',
         mean_path='./data_protocol_gt/datasets/motionx/mean.npy',
         std_path='./data_protocol_gt/datasets/motionx/std.npy'),
    dict(type='Crop', crop_size=196),
    dict(type='ToTensor', keys=data_keys[:2]),
    dict(type='Collect', keys=data_keys, meta_keys=meta_keys),
]
data = dict(
    samples_per_gpu=32,
    test=dict(type='TextMotionDataset', dataset_name='motionx',
              data_prefix='./data_protocol_gt', pipeline=pipeline,
              ann_file='ann.txt', motion_dir='motions', text_dir='texts',
              eval_cfg=dict(
                  shuffle_indexes=True, replication_times=20,
                  replication_reduction='statistics',
                  # small evaluator dims keep the 20x1k CPU encode cheap; the
                  # protocol under test is the counts/statistics machinery,
                  # not the evaluator weights (which are untrained here)
                  evaluator_model=dict(
                      type='T2MContrastiveModel_SMPLX',
                      motion_encoder=dict(nfeats=322, vae=True, num_layers=1,
                                          latent_dim=32, ff_size=32,
                                          num_heads=2),
                      text_encoder=dict(num_layers=1, latent_dim=32,
                                        ff_size=32, num_heads=2,
                                        bert_cfg=dict(dim=32, n_layers=1,
                                                      n_heads=2,
                                                      hidden_dim=64))),
                  metrics=[
                      dict(type='R Precision', batch_size=32, top_k=3),
                      dict(type='Matching Score', batch_size=32),
                      dict(type='FID', emb_scale=1.0),
                      dict(type='Diversity', num_samples=300),
                  ]),
              test_mode=True),
)
model = dict(type='MotionDiffusion',
             inference_type='gt',
             loss_recon=dict(type='MSELoss', loss_weight=1, reduction='none'),
             diffusion_train=dict(beta_scheduler='linear',
                                  diffusion_steps=1000,
                                  model_mean_type='start_x',
                                  model_var_type='fixed_large'),
             diffusion_test=dict(beta_scheduler='linear',
                                 diffusion_steps=1000,
                                 model_mean_type='start_x',
                                 model_var_type='fixed_large'))
