# Round-5 soak + approx-drift harness config: the EXACT flagship 0.125B
# STMoGen topology and DDIM respace (../stmogen/t2m_motionx_0_125b.py) over
# the LEARNABLE protocol-scale synthetic tree
# (`tools/make_tiny_data.py --root ./data_protocol_learn --protocol-learnable`:
# 32 sinusoid-bank caption classes x 32 clips, 196x322).  Train side follows
# the reference recipe (Adam 2e-4, step decay @10, bs 64 via --grad-accum on
# a 16 GB chip — tools/dist_train.sh:1-10 / configs/stmogen/...0_125b.py:13-17);
# test side runs the 20-replication protocol with the TRAINED small
# contrastive evaluator from tools/train_protocol_evaluator.py, making
# R-Precision/Matching discriminative (chance top-1 = 1/32).
_base_ = ['../stmogen/t2m_motionx_0_125b.py']

data_keys = ['motion', 'motion_mask', 'motion_length']
meta_keys = ['text']
pipeline = [
    dict(type='Normalize',
         mean_path='./data_protocol_learn/datasets/motionx/mean.npy',
         std_path='./data_protocol_learn/datasets/motionx/std.npy'),
    dict(type='Crop', crop_size=196),
    dict(type='ToTensor', keys=data_keys[:2]),
    dict(type='Collect', keys=data_keys, meta_keys=meta_keys),
]
evaluator_model = dict(
    type='T2MContrastiveModel_SMPLX',
    # dims shared with tools/train_protocol_evaluator.py — keep in sync
    motion_encoder=dict(nfeats=322, vae=True, num_layers=1, latent_dim=32,
                        ff_size=32, num_heads=2),
    text_encoder=dict(num_layers=1, latent_dim=32, ff_size=32, num_heads=2,
                      bert_cfg=dict(dim=32, n_layers=1, n_heads=2,
                                    hidden_dim=64)),
    init_cfg=dict(type='Pretrained',
                  checkpoint='./outputs/protocol_evaluator.npz'))
data = dict(
    samples_per_gpu=32,
    workers_per_gpu=0,
    train=dict(_delete_=True,
               type='TextMotionDataset', dataset_name='motionx',
               data_prefix='./data_protocol_learn', pipeline=pipeline,
               ann_file='ann.txt', motion_dir='motions', text_dir='texts'),
    test=dict(_delete_=True,
              type='TextMotionDataset', dataset_name='motionx',
              data_prefix='./data_protocol_learn', pipeline=pipeline,
              ann_file='ann.txt', motion_dir='motions', text_dir='texts',
              eval_cfg=dict(
                  shuffle_indexes=True, replication_times=20,
                  replication_reduction='statistics',
                  evaluator_model=evaluator_model,
                  metrics=[
                      dict(type='R Precision', batch_size=32, top_k=3),
                      dict(type='Matching Score', batch_size=32),
                      dict(type='FID', emb_scale=1.0),
                      dict(type='Diversity', num_samples=300),
                  ]),
              test_mode=True),
)
# soak runs control epochs via tools/train.py --max-epochs; disable the
# in-training eval hook (the drift harness evaluates explicitly)
evaluation = None
