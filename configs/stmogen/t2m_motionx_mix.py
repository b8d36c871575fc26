# Small STMoGen on the MC-Bench mix (latent 64x12, ff 256, 4 layers)
# (reference configs/stmogen/T2M_motionx_align_Finedance_Beats2_face_no_loss.py:28-31)
_base_ = ['./t2m_motionx_0_125b.py']

latent_dim = 64
ff_size = 256
model = dict(model=dict(
    latent_dim=latent_dim * 12,
    ca_block_cfg=dict(latent_dim=latent_dim, ffn_dim=ff_size),
    ffn_cfg=dict(latent_dim=latent_dim, ffn_dim=ff_size),
    pose_encoder_cfg=dict(latent_dim=latent_dim),
    pose_decoder_cfg=dict(latent_dim=latent_dim)))
