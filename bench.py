"""Benchmark: steady-state Instant-NGP training throughput (iters/s).

Headline metric mirrors the reference's README claim of ~133 iters/s on an
RTX 3090 (`/root/reference/README.md:114`, BASELINE.md) at ngp_base scale:
4096 rays/batch, 2^18 target samples/batch, 128^3 x 5-cascade occupancy
grid, bf16 MLPs.

Four configs are measured (round 4: compaction is the default, VERDICT
r3 #3 — the reference also trains on compacted samples,
`density_grid_sampler.py:136-167`):
- f8l4+m16f1: the TPU-first flagship/headline — 4 levels x 8 features
  (same 32-wide encoder output as the reference, 1/4 the (sample,level)
  gather/scatter pairs) with ragged compaction at M=2^16 kept samples
  (~= the real-sample count the padded 2^18-slot batch carries at its
  measured ~26% occupancy).  Quality anchored to the measured hard-scene
  ceiling, attached as `quality` when the logs exist;
- f4l8+m16f1 and f2l16+m16f1: the 8x4 and reference-shape 16x2
  geometries under the same compaction, in `extra`;
- f2l16: the reference's exact padded shape (`ngp_base.py:62-70`), for
  round-over-round continuity.

The blender-lego fixture cannot be downloaded here (zero egress), so the
run uses the in-memory SyntheticSpheresDataset whose post-convergence
occupancy (~a centered object at lego-like fill rate) drives the same
sampling workload.  Prints ONE JSON line.
"""

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_ITERS_PER_S = 133.0  # JNeRF-NGP on RTX 3090 (README.md:114)
# The reference trains target_batch_size = 2^18 compacted samples per step
# (ngp_base.py:75): 133 it/s x 2^18 ~= 34.9 M samples/s (BASELINE.md
# derived row).  iters/s alone deflates the comparison when a config
# trains fewer real samples per step (VERDICT r4 missing #1), so the
# bench reports both normalizations.
BASELINE_SAMPLES_PER_S = BASELINE_ITERS_PER_S * (1 << 18)


def parse_variant(variant: str) -> dict:
    """Compaction variant grammar -> config overrides.

    "c<N>" = compact at M=target, march budget factor N (round-3 compat);
    "m<B>" = compact at M=2^B; "f<N>" = march budget factor N;
    "k<B>" = hashed-level table cap 2^B entries (k19 = the reference's
    2^19, `ngp_base.py:69` — served by the round-5 row-sharded RMW
    backward, ops/hash_nbr.py).
    E.g. "m16f1" is the round-4 speed mode, "m18f2k19" the round-5
    quality mode.
    """
    import re

    knobs = {"compacted_batch": True}
    for tok, val in re.findall(r"([cmfk])(\d+)", variant):
        if tok == "m":
            knobs["compacted_batch"] = 1 << int(val)
        elif tok == "k":
            knobs["hashmap_fast_cap"] = 1 << int(val)
        else:  # c and f both set the march budget factor
            knobs["march_budget_factor"] = int(val)
    return knobs


def measure(encoder: str, args) -> dict:
    """Train at bench scale, return {'iters_per_s', 'rays_per_s', ...}."""
    import jax

    from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg
    from jnerf_tpu.utils.metrics import ThroughputMeter
    from jnerf_tpu.runner import Runner

    name, _, variant = encoder.partition("+")
    enc = {"f4l8": dict(hash_levels=8, hash_features=4),
           "f8l4": dict(hash_levels=4, hash_features=8),
           "f2l16": {}}[name]
    cfg = ngp_synthetic_cfg(
        n_images=16,
        H=args.image_size,
        W=args.image_size,
        tot_train_steps=args.warmup + args.steps,
        **enc,
    )
    if variant:
        for k, v in parse_variant(variant).items():
            setattr(cfg, k, v)

    runner = Runner()
    meter = ThroughputMeter(window=args.steps)

    def tick(n, n_rays, n_samples_per_ray):
        for _ in range(n):
            meter.tick(n_rays=n_rays, n_samples=n_rays * n_samples_per_ray)

    # Warmup: compiles + occupancy-grid convergence + batch-shape settling.
    # (train_range dispatches one jitted lax.scan window per refresh
    # interval — the production dispatch pattern.)
    loss = runner.train_range(0, args.warmup)
    float(jax.device_get(loss))  # drain the pipeline (relay-safe sync)

    meter.tick()  # arm the meter's clock at the window start
    t0 = time.perf_counter()
    loss = runner.train_range(args.warmup, args.warmup + args.steps, tick=tick)
    float(jax.device_get(loss))
    elapsed = time.perf_counter() - t0

    iters_per_s = args.steps / elapsed
    # meter tracks the (possibly adapting) per-step ray/sample counts; the
    # wall clock for rates is the blocking window above (dispatch is async).
    mean_rays = sum(meter.rays) / max(len(meter.rays), 1)
    # REAL samples trained per step (VERDICT r4 #1/#2): the march's valid-
    # sample demand per ray (EMA over the run's adaptation windows), times
    # rays, clipped to what the step keeps — the compaction cap M, or the
    # padded [R, S] slot count.  This is what `vs_baseline_samples`
    # normalizes against the reference's 2^18 real samples/step.
    sampler = runner.sampler
    demand = sampler._demand_ema or 0.0
    kept_cap = (cfg.compacted_batch if getattr(cfg, "compacted_batch", None)
                else sampler.n_rays_per_batch * sampler.n_samples_per_ray)
    if kept_cap is True:
        kept_cap = sampler.target_batch_size
    samples_per_step = min(demand * sampler.n_rays_per_batch, kept_cap)
    return {
        "iters_per_s": round(iters_per_s, 2),
        "rays_per_s": round(iters_per_s * mean_rays),
        "samples_per_step": round(samples_per_step),
        "samples_per_s": round(iters_per_s * samples_per_step),
        "n_rays_per_batch": sampler.n_rays_per_batch,
        "samples_per_ray": sampler.n_samples_per_ray,
        "elapsed_s": round(elapsed, 2),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    parser.add_argument("--warmup", type=int, default=512)
    parser.add_argument("--steps", type=int, default=256)
    parser.add_argument("--image-size", type=int, default=512)
    parser.add_argument("--encoder", default="both",
                        help="f2l16 | f4l8 | f8l4 (optionally '+cN' for "
                             "ragged compaction with march budget factor "
                             "N, e.g. f8l4+c4) | both")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # Round-5 default set: the HEADLINE is quality-gated (VERDICT r4 #2) —
    # the first config is the best config that passes the quality bar
    # (the measured hard-scene ceiling ledger in logs/), not the fastest
    # corner.  Speed modes (m16f1: 25.2 dB config ceiling) stay in extras.
    # The reference trains on compacted samples by default
    # (density_grid_sampler.py:136-167); padded baselines live in
    # logs/quality/compact_ab_*.jsonl.
    # f8l4+m17f2k19: reference-capacity (2^19-entry) tables at the TPU-fast
    # 4x8 geometry — measured hard-scene ceiling 36.0 dB (the scene's
    # reference-class target; logs/ceiling_f8l4_m17f2k19_hard.json), served
    # by the round-5 row-sharded RMW backward + MXU-permute unpack.
    shapes = (["f8l4+m17f2k19", "f8l4+m17f2", "f8l4+m16f1", "f4l8+m16f1",
               "f2l16+m16f1", "f2l16"]
              if args.encoder == "both" else [args.encoder])
    # Per-config isolation (VERDICT r3 weak #1): round 3's f2l16 Pallas
    # crash destroyed the already-finished f4l8 headline because every
    # config was measured before anything was printed.  Now each config is
    # measured under its own trap, progress is streamed to stderr as it
    # completes, and a failed config becomes an {"error": ...} entry in
    # the JSON instead of taking the whole bench down.
    results = {}
    for s in shapes:
        try:
            results[s] = measure(s, args)
        except Exception as e:  # noqa: BLE001 — the instrument must survive
            results[s] = {"error": f"{type(e).__name__}: {e}"[:500]}
        print(f"[bench] {s}: {json.dumps(results[s])}", file=sys.stderr,
              flush=True)

    ok = [s for s in shapes if "error" not in results[s]]
    if not ok:
        print(json.dumps({"metric": "ngp_train_iters_per_s", "value": 0,
                          "unit": "iters/s", "vs_baseline": 0.0,
                          "extra": {"errors": results}}))
        sys.exit(1)
    head_name = ok[0]  # list order = headline preference
    headline = results[head_name]
    extra = {
        "encoder": head_name,
        **headline,
        "backend": jax.default_backend(),
    }
    extra.pop("iters_per_s")
    for name in shapes:
        if name != head_name:
            extra[name] = results[name]
    # Attach the quality anchor for the headline config when the ledger
    # artifacts exist (tools/ceiling_run.py + bench_psnr.py, VERDICT r2 #2):
    # the headline is a deviated encoder shape, and its claim to flagship
    # status is carried by PSNR@5min as a fraction of the measured ceiling.
    here = os.path.dirname(os.path.abspath(__file__))
    head_file = head_name.replace("+", "_")  # f8l4+c4 -> f8l4_c4
    try:
        # Prefer the round-4 hard-scene artifacts (the plain scene
        # saturated at its ceiling and stopped discriminating).
        for sfx in ("_hard", ""):
            cpath = os.path.join(here, "logs",
                                 f"ceiling_{head_file}{sfx}.json")
            qpath = os.path.join(here, "logs", "quality",
                                 f"psnr300_{head_file}{sfx}.json")
            if os.path.exists(cpath) and os.path.exists(qpath):
                break
        with open(cpath) as f:
            ceil = json.load(f)
        with open(qpath) as f:
            at5 = json.load(f)
        extra["quality"] = {
            "psnr_at_5min": at5["value"],
            "psnr_ceiling": ceil["psnr_ceiling"],
            "fraction_of_ceiling": round(
                at5["value"] / ceil["psnr_ceiling"], 3),
            "scene": ceil["scene"],
        }
        # Stale-pair guards (VERDICT r4 weak #2: a 5-min point measured
        # against a pre-fix ceiling shipped fraction > 1 for a round).
        # A fraction past 1.02 means one side of the pair predates a
        # code change; mismatched git_revs mean the pair cannot be
        # claimed as one measurement even when the fraction looks sane.
        if extra["quality"]["fraction_of_ceiling"] > 1.02:
            extra["quality"]["fraction_suspect"] = True
        crev = ceil.get("git_rev")
        qrev = at5.get("git_rev") or at5.get("extra", {}).get("git_rev")
        if crev and qrev and crev != qrev:
            # Different revs only invalidate the pair when the diff
            # between them touches the model/runtime package — a pair
            # split by a bench- or docs-only commit is one code state.
            import subprocess
            try:
                touched = subprocess.run(
                    ["git", "diff", "--name-only", f"{crev}..{qrev}",
                     "--", "jnerf_tpu"],
                    capture_output=True, text=True, cwd=here, timeout=10,
                ).stdout.strip()
            except (OSError, subprocess.SubprocessError):
                touched = "(git unavailable: assume mismatch)"
            if touched:
                extra["quality"]["rev_mismatch"] = f"{crev}!={qrev}"
    except (OSError, KeyError, ValueError) as e:
        # A headline with no quality anchor is a defect worth surfacing,
        # not hiding (round 3 shipped a corrupt psnr300_f8l4.json that the
        # old bare `pass` would have silently swallowed).
        extra["quality_error"] = f"{type(e).__name__}: {e}"[:200]
    # Work-normalized throughput next to iters/s (VERDICT r4 #2): a step
    # that trains fewer real samples than the reference's 2^18 must not
    # claim its per-iteration speed as parity.
    extra["vs_baseline_samples"] = round(
        headline.get("samples_per_s", 0) / BASELINE_SAMPLES_PER_S, 3)
    result = {
        "metric": "ngp_train_iters_per_s",
        "value": headline["iters_per_s"],
        "unit": "iters/s",
        "vs_baseline": round(headline["iters_per_s"] / BASELINE_ITERS_PER_S, 3),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
