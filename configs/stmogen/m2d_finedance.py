# Music-to-dance ControlNet, small (latent 64x12, ff 256, 4 layers)
# (reference configs/stmogen/M2D_finedance_no_face_loss.py:28-31,124)
_base_ = ['./m2d_finedance_0125b.py']

checkpoint_config = dict(interval=12)
runner = dict(type='EpochBasedRunner', max_epochs=196)

latent_dim = 64
ff_size = 256
num_heads = 12
model = dict(model=dict(
    base_model=dict(latent_dim=latent_dim * num_heads,
                    ca_block_cfg=dict(latent_dim=latent_dim, ffn_dim=ff_size),
                    ffn_cfg=dict(latent_dim=latent_dim, ffn_dim=ff_size),
                    pose_encoder_cfg=dict(latent_dim=latent_dim),
                    pose_decoder_cfg=dict(latent_dim=latent_dim)),
    condition_encode_cfg=dict(condition_latent_dim=latent_dim * num_heads)))
data = dict(samples_per_gpu=128)
base_checkpoint = './outputs/t2m_small/params.npz'
