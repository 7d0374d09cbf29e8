"""Close the VE chunked-dispatch gap (VERDICT r4 ask #7).

The r3/r4 record: PC-1000 monolithic at batch 64 measured 3.6 imgs/s; the
tunnel-safe chunked mode at batch 256 measured 2.9.  Two confounds were
never separated: the per-chunk dispatch overhead and the per-image UNet
efficiency vs batch size (NCSN++ CIFAR10 is small; larger batches can LOSE
per-image efficiency once activations spill VMEM).  This grid measures
(batch x chunk) on the real chip:

- batch in {64, 128, 256};
- chunk in {0 (monolithic), 200, 400, 500} — a chunk's dispatch must stay
  sub-minute (the tunnel drops multi-minute dispatches), so monolithic runs
  are attempted ONLY when the chunked rate at the same batch predicts a
  sub-60s scan, and larger batches get proportionally larger chunks.

Output: sweep_logs/ve_chunk_r5.json — one row per safe config with imgs/s
and the predicted single-dispatch seconds; the headline row is the best
tunnel-SAFE configuration (every dispatch < 60s), i.e. the number the
production measure path actually achieves.

Usage: python tools/r5_ve_chunk.py [--steps 1000] [--n_rep 1]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def log(msg: str) -> None:
    print(f"[ve_chunk +{time.time() - T0:7.1f}s] {msg}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--n_rep", type=int, default=1)
    ap.add_argument("--safe_dispatch_s", type=float, default=55.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from villandiffusion_tpu import factory as F
    from villandiffusion_tpu.core import schedules as S
    from villandiffusion_tpu.utils.jaxruntime import setup_jax_cache

    setup_jax_cache()
    ve = F.get_model_sched(
        image_size=32, channels=3, ckpt="NCSNPP-32-DEFAULT",
        sde_type=S.SDE_VE,
    )
    pipe = ve.make_pipeline(
        sched_name="SCORE-SDE-VE-SCHED", compute_dtype=jnp.bfloat16)

    def run(batch: int, chunk: int) -> float:
        os.environ["VILLAN_SCAN_CHUNK"] = str(chunk)
        pipe(batch_size=batch, num_inference_steps=args.steps,
             rng=jax.random.PRNGKey(0), output_type="uint8")  # compile
        t0 = time.perf_counter()
        for i in range(args.n_rep):
            np.asarray(pipe(
                batch_size=batch, num_inference_steps=args.steps,
                rng=jax.random.PRNGKey(1 + i), output_type="uint8",
            ).images)
        dt = (time.perf_counter() - t0) / args.n_rep
        return batch / dt

    results = {}
    # chunked first (always tunnel-safe), smallest batch first so the
    # monolithic-feasibility estimate for each batch exists before use
    grid = [(64, 200), (64, 400), (128, 200), (128, 400),
            (256, 200), (256, 400), (256, 500)]
    for batch, chunk in grid:
        ips = run(batch, chunk)
        seg_s = (2 * chunk) / (2 * args.steps) * (batch / ips)
        results[f"b{batch}_c{chunk}"] = {
            "imgs_per_s": round(ips, 3), "dispatch_s": round(seg_s, 1),
            "tunnel_safe": seg_s < args.safe_dispatch_s,
        }
        log(f"batch {batch} chunk {chunk}: {ips:.3f} imgs/s "
            f"(~{seg_s:.1f}s/dispatch)")

    # monolithic where the chunked rate predicts a sub-minute full scan
    for batch in (64, 128, 256):
        est = min(batch / v["imgs_per_s"]
                  for k, v in results.items() if k.startswith(f"b{batch}_"))
        if est < args.safe_dispatch_s:
            ips = run(batch, 0)
            results[f"b{batch}_mono"] = {
                "imgs_per_s": round(ips, 3), "dispatch_s": round(est, 1),
                "tunnel_safe": True,
            }
            log(f"batch {batch} monolithic: {ips:.3f} imgs/s "
                f"(~{est:.0f}s/dispatch)")
        else:
            log(f"batch {batch} monolithic skipped: predicted "
                f"{est:.0f}s/dispatch exceeds the safe cap")

    safe = {k: v for k, v in results.items() if v["tunnel_safe"]}
    best = max(safe, key=lambda k: safe[k]["imgs_per_s"])
    summary = {
        "grid": results,
        "best_tunnel_safe": {"config": best, **safe[best]},
        "protocol": f"PC-{args.steps} (2 NCSN++ evals/step), CIFAR10-32, "
                    "bf16, uint8 fetch included",
    }
    os.makedirs("sweep_logs", exist_ok=True)
    with open("sweep_logs/ve_chunk_r5.json", "w") as f:
        json.dump(summary, f, indent=2)
    log(json.dumps(summary["best_tunnel_safe"]))


if __name__ == "__main__":
    main()
