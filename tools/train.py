"""Training entry point.

The reference references tools/train.py from dist_train.sh but never released
it (SURVEY.md §0); this provides the full driver over the library API:
config -> datasets -> mesh -> pjit train loop -> per-epoch checkpoints/eval.

Usage:
  python tools/train.py configs/stmogen/t2m_motionx_0_125b.py \
      --work-dir outputs/t2m_0_125b [--resume] [--cfg-options k=v ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Train a motion diffusion model")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--base-checkpoint", default=None,
                   help="pretrained base params (.npz) for ControlNet training")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--tensor-parallel", type=int, default=1,
                   help="shard FFN/MoE weights over a 'tensor' mesh axis of "
                        "this size (Megatron-style; parallel/tp.py). "
                        "Single-host only for now")
    p.add_argument("--pipeline-parallel", type=int, default=1,
                   help="GPipe the decoder stack over a 'pipe' mesh axis of "
                        "this size (parallel/pp.py); sets "
                        "model.pipeline_axis. Mutually exclusive with "
                        "--tensor-parallel/--multihost")
    p.add_argument("--pipeline-microbatches", type=int, default=2)
    p.add_argument("--grad-accum", type=int, default=None,
                   help="accumulate gradients over N microbatches per "
                        "optimizer step (lax.scan; ~1/N activation memory — "
                        "fits the reference's global-batch-128 recipe on a "
                        "16 GB chip).  Default: config optimizer_config."
                        "cumulative_iters, else 1")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize + dcn mesh axis "
                        "(multi-slice / multi-host; the reference's "
                        "torch.distributed.launch equivalent)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (multihost off-pod; on TPU "
                        "pods auto-detected)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--cfg-options", nargs="*", default=None)
    return p.parse_args()


def build_train_dataset(data_cfg):
    from motioncraft_tpu.data.datasets import build_mixed_dataset
    from motioncraft_tpu.registry import DATASETS
    train = data_cfg["train"]
    if "base" in train:
        return build_mixed_dataset(train)
    return DATASETS.build(train)


def main():
    args = parse_args()
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from motioncraft_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()  # remote-AOT tunnel compiles cost minutes; cache them
    import motioncraft_tpu.models  # noqa: F401
    import motioncraft_tpu.data  # noqa: F401  (register DATASETS/PIPELINES)
    from motioncraft_tpu.config import Config, cfg_options_from_args
    from motioncraft_tpu.data import build_dataloader
    from motioncraft_tpu.apis.train import train_model
    from motioncraft_tpu.parallel import create_mesh, init_distributed
    from motioncraft_tpu.registry import build_architecture
    from motioncraft_tpu.utils.checkpoint import save_checkpoint, save_params, load_checkpoint, latest_step
    from motioncraft_tpu.utils.logger import get_root_logger

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(cfg_options_from_args(args.cfg_options))
    work_dir = args.work_dir or os.path.join(
        "outputs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(os.path.join(work_dir, "train.log"))
    logger.info(f"config: {args.config}\nwork_dir: {work_dir}")

    arch = build_architecture(cfg.model)
    dataset = build_train_dataset(cfg.data)
    if args.multihost:
        init_distributed(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)
    # multihost: each process loads its interleaved 1/process_count slice
    loader = build_dataloader(dataset, samples_per_gpu=cfg.data["samples_per_gpu"],
                              shuffle=True, seed=args.seed, dist=args.multihost,
                              workers_per_gpu=cfg.data.get("workers_per_gpu", 2))
    if args.pipeline_parallel > 1:
        if args.multihost or args.tensor_parallel > 1:
            raise SystemExit("--pipeline-parallel composes only with the "
                             "data axis for now")
        import jax
        n = args.devices or len(jax.devices())
        pp = args.pipeline_parallel
        if n % pp:
            raise SystemExit(f"--pipeline-parallel {pp} does not divide {n} devices")
        if cfg.model["model"].get("type") != "STMoGenTransformer":
            raise SystemExit("--pipeline-parallel is implemented for "
                             "STMoGenTransformer decoder stacks")
        mesh = create_mesh(n, axes=("data", "pipe"), shape=(n // pp, pp))
        cfg.model["model"]["pipeline_axis"] = "pipe"
        cfg.model["model"]["pipeline_microbatches"] = args.pipeline_microbatches
    elif args.tensor_parallel > 1:
        if args.multihost:
            raise SystemExit("--tensor-parallel with --multihost is not "
                             "supported yet (tensor collectives must stay "
                             "on ICI; shard tp within a slice)")
        import jax
        n = args.devices or len(jax.devices())
        tp = args.tensor_parallel
        if n % tp:
            raise SystemExit(f"--tensor-parallel {tp} does not divide {n} devices")
        ep = 2 if (n // tp) % 2 == 0 and n // tp >= 2 else 1
        mesh = create_mesh(n, axes=("data", "expert", "tensor"),
                           shape=(n // (tp * ep), ep, tp))
    else:
        mesh = create_mesh(args.devices, dcn_axis=args.multihost)
    logger.info(f"mesh: {dict(mesh.shape)}; dataset: {len(dataset)} samples, "
                f"{len(loader)} steps/epoch")

    frozen = ("text_enc/clip",)
    if cfg.model["model"].get("type") in ("ControlT2MHalf", "ControlT2MHalfMCM"):
        from motioncraft_tpu.models.controlnet import controlnet_frozen_prefixes
        m = cfg.model["model"]
        frozen = tuple(controlnet_frozen_prefixes(
            m.get("joint_embed_unfreeze", True), m.get("unfreeze_mode", "all"))
            ) + ("base_model/text_enc/clip",)

    ckpt_dir = os.path.join(work_dir, "ckpt")
    # mmcv checkpoint_config equivalent: interval + max_keep_ckpts pruning
    ckpt_cfg = cfg.get("checkpoint_config", {}) or {}
    ckpt_interval = ckpt_cfg.get("interval", 1)
    max_keep = ckpt_cfg.get("max_keep_ckpts")

    def checkpoint_fn(state, epoch):
        if (epoch + 1) % ckpt_interval != 0:
            return
        save_checkpoint(ckpt_dir, state, epoch, max_to_keep=max_keep)
        save_params(os.path.join(work_dir, "params.npz"), {"params": state.params})
        logger.info(f"saved checkpoint at epoch {epoch}")

    variables_transform = None
    if args.base_checkpoint:
        from motioncraft_tpu.models.controlnet import init_control_blocks_from_base
        from motioncraft_tpu.utils.checkpoint import load_params
        import flax
        import jax as _jax
        import numpy as _np

        def variables_transform(variables):
            """Load the pretrained base into base_model/* and copy the first
            k blocks into the control branch (the reference's ControlNet
            training setup)."""
            base = load_params(args.base_checkpoint)["params"]
            variables = flax.core.unfreeze(variables)
            params = _jax.tree_util.tree_map(_np.asarray, variables["params"])
            if "base_model" in params:
                params["base_model"] = base
                params = init_control_blocks_from_base(
                    params, cfg.model["model"].get("copy_blocks_num", 2))
            else:
                params = base
            variables["params"] = params
            logger.info(f"loaded base checkpoint {args.base_checkpoint}")
            return variables

    eval_fn = None
    if cfg.get("evaluation") and cfg.data.get("test"):
        from motioncraft_tpu.apis.eval_hook import EvalHook
        from motioncraft_tpu.registry import DATASETS
        ev = dict(cfg["evaluation"])
        eval_fn = EvalHook(DATASETS.build(cfg.data["test"]), arch,
                           batch_size=ev.get("batch_size", 32),
                           interval=ev.get("interval", 1),
                           limit=ev.get("limit"),
                           save_best=ev.get("save_best"),
                           work_dir=work_dir, logger=logger.info)

    max_epochs = args.max_epochs or cfg.get("runner", {}).get("max_epochs", 1)
    state = train_model(
        arch, loader,
        optimizer_cfg=dict(cfg.get("optimizer", {"type": "Adam", "lr": 2e-4})),
        lr_config=dict(cfg.get("lr_config", {})) or None,
        grad_clip=(cfg.get("optimizer_config", {}) or {}).get("grad_clip"),
        max_epochs=max_epochs,
        steps_per_epoch=len(loader),
        seed=args.seed, mesh=mesh,
        log_interval=cfg.get("log_config", {}).get("interval", 50),
        logger=logger.info,
        checkpoint_fn=checkpoint_fn,
        eval_fn=eval_fn,
        frozen_prefixes=frozen,
        resume_dir=ckpt_dir if args.resume else None,
        variables_transform=variables_transform,
        fp16=cfg.get("fp16"),
        grad_accum=args.grad_accum or (cfg.get("optimizer_config", {}) or {})
        .get("cumulative_iters", 1))
    logger.info(f"training done at step {int(state.step)}")


if __name__ == "__main__":
    main()
