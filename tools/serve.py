"""Text-to-motion HTTP serving: dynamic request batching over the jitted
CFG-DDIM sampler (motioncraft_tpu/serving/server.py).

The reference ships research CLIs only (one prompt per process run,
tools/visualize.py:46-273); this stands the same sampling path up as a
long-lived service.  Concurrent POSTs are grouped by the dynamic batcher
into one TPU dispatch per batch bucket (static shapes, one executable per
bucket), so throughput scales with traffic instead of process count.

Usage:
  python tools/serve.py configs/stmogen/t2m_motionx_0_125b.py \
      --checkpoint params.npz --port 8080 --bf16 --warmup

  curl -s localhost:8080/generate -d '{"text": "a person waves", "length": 64}'
  curl -s localhost:8080/stats
"""

import argparse
import json
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--torch-checkpoint", default=None,
                   help="released reference .pth (converted on load)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 2, 4, 8],
                   help="static batch buckets (one compiled executable each)")
    p.add_argument("--seq-buckets", type=int, nargs="+", default=None,
                   help="motion-length buckets (must end at max_seq_len); "
                        "short requests run a short-T executable")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each dispatch's batch rows over the device "
                        "mesh's data axis (batch buckets must tile it)")
    p.add_argument("--max-wait-ms", type=float, default=20.0,
                   help="dynamic-batching window after the first request")
    p.add_argument("--window", type=int, default=None,
                   help="long-form generation window (default: the model's "
                        "max_seq_len); /generate_long produces arbitrary "
                        "lengths window-by-window with RePaint overlaps")
    p.add_argument("--pre-frames", type=int, default=4,
                   help="overlap frames outpainted between long-form windows")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 denoiser compute (params cast + compute_dtype)")
    p.add_argument("--int8", action="store_true",
                   help="int8 W8A8 denoiser weights (ops/quant.py)")
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile every bucket before accepting traffic")
    p.add_argument("--cfg-options", nargs="*", default=None)
    return p.parse_args()


def build_server(args):
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import motioncraft_tpu.models  # noqa: F401
    from motioncraft_tpu.apis.factory import make_text_batch
    from motioncraft_tpu.config import Config, cfg_options_from_args
    from motioncraft_tpu.registry import build_architecture
    from motioncraft_tpu.serving import MotionGenServer

    cfg = Config.fromfile(args.config)
    cfg.merge_from_dict(cfg_options_from_args(args.cfg_options))
    max_seq_len = cfg.model["model"].get("max_seq_len", 196)
    input_feats = cfg.model["model"].get("input_feats", 322)

    arch = build_architecture(cfg.model)
    variables = arch.init(jax.random.PRNGKey(args.seed),
                          make_text_batch(["init"], max_seq_len=max_seq_len,
                                          input_feats=input_feats))
    if args.torch_checkpoint:
        from motioncraft_tpu.utils.checkpoint import load_eval_variables
        variables = load_eval_variables(cfg.model, variables,
                                        torch_checkpoint=args.torch_checkpoint)
    elif args.checkpoint:
        from motioncraft_tpu.utils.checkpoint import load_params
        variables = load_params(args.checkpoint)

    compute_dtype = None
    if args.bf16:
        from motioncraft_tpu.apis import bf16_cast_variables
        compute_dtype = jnp.bfloat16
        variables = bf16_cast_variables(variables)
    if args.int8:
        from motioncraft_tpu.apis import int8_quantize_variables
        variables = int8_quantize_variables(variables)

    mean = std = None
    for step in (cfg.get("data", {}).get("test", {}) or {}).get("pipeline", []):
        if step.get("type") == "Normalize" and os.path.isfile(step["mean_path"]):
            mean, std = np.load(step["mean_path"]), np.load(step["std_path"])

    mesh = None
    if args.data_parallel:
        from motioncraft_tpu.parallel import create_mesh
        mesh = create_mesh()

    srv = MotionGenServer(arch, variables, max_seq_len=max_seq_len,
                          input_feats=input_feats,
                          batch_buckets=sorted(set(args.buckets)),
                          seq_buckets=args.seq_buckets,
                          max_wait_ms=args.max_wait_ms, seed=args.seed,
                          compute_dtype=compute_dtype, mean=mean, std=std,
                          mesh=mesh, window=args.window,
                          pre_frames=args.pre_frames)
    if args.warmup:
        print("warmup: compiling batch buckets", args.buckets, flush=True)
        srv.warmup()
    return srv.start()


def make_handler(srv):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/stats":
                self._json(200, srv.stats())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path not in ("/generate", "/generate_long"):
                return self._json(404, {"error": "unknown path"})
            try:
                req = json.loads(
                    self.rfile.read(int(self.headers.get("Content-Length", 0))))
                texts = req.get("texts") or [req["text"]]
                conds = req.get("conditions") or [req.get("condition")] * len(texts)
                conds = [None if c is None else np.asarray(c, np.float32)
                         for c in conds]
                if self.path == "/generate_long":
                    # long-form: arbitrary total_frames, windowed RePaint
                    # generation; concurrent requests run in lockstep
                    totals = req.get("total_frames")
                    totals = totals if isinstance(totals, list) else [totals] * len(texts)
                    futures = [srv.submit_long(t, n, condition=c)
                               for t, n, c in zip(texts, totals, conds)]
                else:
                    lengths = req.get("lengths") or [req.get("length")] * len(texts)
                    futures = [srv.submit(t, l, condition=c)
                               for t, l, c in zip(texts, lengths, conds)]
                outs = [f.result() for f in futures]
                self._json(200, {"motions": [o.tolist() for o in outs],
                                 "lengths": [int(o.shape[0]) for o in outs]})
            except Exception as e:  # noqa: BLE001 — surfaced to the client
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *a):  # quiet access log
            pass

    return Handler


def main():
    args = parse_args()
    srv = build_server(args)
    from http.server import ThreadingHTTPServer
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(srv))
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"(buckets {args.buckets}, wait {args.max_wait_ms} ms)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        srv.stop()


if __name__ == "__main__":
    main()
