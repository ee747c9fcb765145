"""Train a CRFP for real on procedural clips (VERDICT round-2 task 4).

The container has no REDS/Vimeo data and no reference checkpoints, so the
trained-weights gates (windowed-clamp cost under a LEARNED flow net, the
deploy gate, the round-5 capability ablation) use models trained here on
the procedural STRUCTURED corpus (crfp_tpu/data/procedural.py: dead
leaves, text glyphs, gratings, layered independent motion — content an 8x
foveated VSR model can recover, unlike the round-2..4 noise+ridge clips).
The recipe mirrors the reference trainer (Charbonnier loss eps 1e-12,
two-group Adam with the flow-net group at lr/8, cosine schedule, flow
freeze then unfreeze — /root/reference/trainer.py:120-229) scaled down to
this host.

Run (TPU, ~45 min at the defaults):
    python -m crfp_tpu.tools.train_procedural --iters 8000 --mid 32 \
        --save checkpoints/v18_mid32_struct.npz

The persistent XLA compile cache is enabled by default at .jax_cache/ so
re-runs and bigger rungs skip recompilation.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from crfp_tpu.data.procedural import make_clip_pool  # noqa: F401  (corpus)


def make_batch(clips, b: int, t: int, gt: int, rng, scale: int = 8):
    import jax.numpy as jnp

    from crfp_tpu.data.fovea import fovea_generator

    hrs, lrs, mks = [], [], []
    for _ in range(b):
        hr = clips[int(rng.integers(0, len(clips)))]
        hrs.append(hr)
        lrs.append(hr.reshape(t, gt // scale, scale, gt // scale, scale, 3).mean((2, 4)))
        _, mk, _ = fovea_generator(hr, method="Nanascan",
                                   fv_hw=(gt // 2, gt // 2), rng=rng)
        mks.append(mk)
    hr = jnp.asarray(np.stack(hrs))
    return {"hr": hr, "lr": jnp.asarray(np.stack(lrs)), "fv": hr,
            "mk": jnp.asarray(np.stack(mks))}


def save_params(params, path: str) -> None:
    from crfp_tpu.utils.params_io import save_params_npz

    save_params_npz(params, path)


def load_params(path: str):
    from crfp_tpu.utils.params_io import load_params as _load

    return _load(path)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--b", type=int, default=2)
    p.add_argument("--t", type=int, default=5)
    p.add_argument("--gt", type=int, default=160)
    p.add_argument("--mid", type=int, default=16)
    p.add_argument("--variant", default="v18")
    p.add_argument("--dcn_window", type=int, default=8)
    p.add_argument("--dcn_window_hr", type=int, default=32)
    p.add_argument("--flow_freeze", type=int, default=300)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--pool", type=int, default=48)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save", default="checkpoints/v18_mid16_procedural.npz")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute with f32 masters (TrainConfig.amp)")
    p.add_argument("--no_cache", action="store_true")
    # train with per-cell anchored windows (the deployment kernel's
    # anchor_vjp backward — TPU backend; CPU falls back to the plain
    # clamp). Used by the anchored-vs-plain training A/B in docs/DEPLOY.md.
    p.add_argument("--dcn_anchor", action="store_true")
    # continue from an existing .npz checkpoint: params are restored,
    # Adam moments restart fresh (the npz format stores params only —
    # full opt-state resume is the orbax path in main.py). Keep the lr
    # schedule sensible by passing the REMAINING --iters.
    p.add_argument("--resume", default=None)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.no_cache:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    from crfp_tpu.bench.profile import force_sync
    from crfp_tpu.models import CRFP, ModelConfig
    from crfp_tpu.train import TrainConfig, create_train_state, make_train_step

    # the ablation variants only support the reference's hr_dcn=False path
    # (models/crfp.py setup); their PlainAlign/2x-only stages ignore the
    # window knobs
    hr_dcn = args.variant not in ("no_dcn", "basic_fvsr")
    cfg = ModelConfig(variant=args.variant, mid_channels=args.mid, hr_dcn=hr_dcn,
                      dcn_window=args.dcn_window, dcn_window_hr=args.dcn_window_hr,
                      dcn_anchor=args.dcn_anchor, dcn_anchor_vjp=args.dcn_anchor,
                      remat=True)
    model = CRFP(cfg)
    tcfg = TrainConfig(lr_rate=args.lr, flow_freeze_iters=args.flow_freeze,
                       periods=(max(args.iters, 1),), amp=args.amp)

    rng = np.random.default_rng(args.seed)
    # corpus disk cache: clip generation is ~10 min of single-core host
    # time and every run in an ablation chain uses the identical pool
    cache_npz = os.path.join(
        "runs", f"pool_{args.pool}x{args.t}x{args.gt}_s{args.seed}.npz")
    if os.path.exists(cache_npz):
        print(f"loading clip pool from {cache_npz}...", flush=True)
        with np.load(cache_npz) as z:
            clips = [z[k] for k in z.files]
    else:
        print(f"generating {args.pool} procedural clips (t={args.t}, GT={args.gt})...",
              flush=True)
        clips = make_clip_pool(args.pool, args.t, args.gt, args.seed)
        os.makedirs(os.path.dirname(cache_npz) or ".", exist_ok=True)
        np.savez(cache_npz, *clips)
    batch = make_batch(clips, args.b, args.t, args.gt, rng)

    state = create_train_state(model, jax.random.PRNGKey(args.seed),
                               {k: v[:1] for k, v in batch.items()}, tcfg)
    if args.resume:
        import flax

        loaded = jax.tree.map(jnp.asarray, load_params(args.resume))
        got = {k: v.shape for k, v in
               flax.traverse_util.flatten_dict(loaded, sep="/").items()}
        want = {k: v.shape for k, v in
                flax.traverse_util.flatten_dict(state.params, sep="/").items()}
        if got.keys() != want.keys():
            miss = sorted(want.keys() - got.keys())[:5]
            extra = sorted(got.keys() - want.keys())[:5]
            raise ValueError(
                f"--resume checkpoint does not match --variant/--mid: "
                f"missing keys {miss}, unexpected keys {extra}")
        bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
        if bad:
            raise ValueError(f"--resume param shape mismatch: {bad}")
        state = state.replace(params=loaded)
        print(f"resumed params from {args.resume}", flush=True)
    train_step = make_train_step(model, tcfg)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"{n_params/1e6:.2f}M params; compiling train step...", flush=True)

    t0 = time.perf_counter()
    state, metrics = train_step(state, batch)
    force_sync(metrics["loss"])
    print(f"compiled+step0 in {time.perf_counter()-t0:.1f}s", flush=True)

    os.makedirs(os.path.dirname(args.save) or ".", exist_ok=True)
    curve = []
    t_run = time.perf_counter()
    for it in range(1, args.iters):
        batch = make_batch(clips, args.b, args.t, args.gt, rng)
        state, metrics = train_step(state, batch)
        if it % 100 == 0 or it == args.iters - 1:
            loss = float(metrics["loss"])
            psnr = float(metrics.get("psnr", jnp.nan))
            dt = (time.perf_counter() - t_run) / it
            curve.append({"iter": it, "loss": loss, "psnr": psnr})
            print(f"iter {it:5d}  loss {loss:.5f}  psnr {psnr:.2f}  "
                  f"{dt*1e3:.0f} ms/it", flush=True)
        if it % 500 == 0:
            # periodic checkpoint so a killed run still yields a model
            save_params(jax.device_get(state.params), args.save)

    os.makedirs(os.path.dirname(args.save) or ".", exist_ok=True)
    save_params(jax.device_get(state.params), args.save)
    with open(args.save.replace(".npz", "_curve.json"), "w") as f:
        json.dump({"config": vars(args), "curve": curve}, f, indent=1)
    print(f"saved {args.save}", flush=True)


if __name__ == "__main__":
    main()
