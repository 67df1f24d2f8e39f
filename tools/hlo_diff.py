"""HLO diff probe for the residual sharded@1 vs single-device gap.

Compiles grad(sum(f(eq, ek) * w)) for (a) the single-device Pallas fast
path and (b) the sharded@1 Pallas path (unit mesh: no shard_map, no
collectives after round 4), at arxiv scale on the real TPU, then prints
per-category instruction counts and every gather/fusion with a >=1M-row
operand, so the extra ~1.3 ms/layer of work shows up as concrete ops.

Run alone on the TPU:  python tools/hlo_diff.py
"""

from __future__ import annotations

import re
import sys
from collections import Counter


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CATS = ("fusion", "gather(", "copy(", "convert(", "custom-call",
        "transpose(", "concatenate(", "pad(", "slice(", "reduce(",
        "dynamic-slice(", "dynamic-update-slice(")


def summarize(hlo: str, label: str):
    counts = Counter()
    big = []
    for line in hlo.splitlines():
        if " = " not in line:
            continue
        for c in CATS:
            if f" {c}" in line or f"){c}" in line:
                counts[c] += 1
        m = re.search(r"= (?:\(|)(?:f32|bf16|s32|u32)\[(\d+)(?:,(\d+))?\]"
                      r"[^ ]* (gather|fusion|copy|convert)", line)
        if m and int(m.group(1)) >= 1_000_000:
            shape = m.group(1) + ("," + m.group(2) if m.group(2) else "")
            big.append((m.group(3), shape))
    log(f"--- {label} ---")
    log("counts: " + ", ".join(f"{k}={v}" for k, v in sorted(
        counts.items())))
    bc = Counter(big)
    for (op, shape), n in sorted(bc.items()):
        log(f"  big {op:8s} [{shape}] x{n}")
    return counts, bc


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, ".")
    from sir_gcn_tpu import add_self_loops, build_graph, to_bidirected
    from sir_gcn_tpu.ops import set_edge_dtype
    from sir_gcn_tpu.ops.ell import build_fast_graph, ell_sir_aggregate
    from sir_gcn_tpu.parallel import make_mesh
    from sir_gcn_tpu.parallel.ell_distributed import (
        build_sharded_fast_graph,
        make_sharded_sir_aggregate_pallas,
    )

    N, E_RAW, H = 169_343, 1_166_243, 96
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E_RAW)
    dst = rng.integers(0, N, E_RAW)
    src, dst = to_bidirected(src, dst)
    src, dst = add_self_loops(src, dst, N)
    g = build_graph(src, dst, N, pad_multiple=1024)
    fg = build_fast_graph(g)
    set_edge_dtype(jnp.bfloat16)
    sfg = build_sharded_fast_graph(g, 1, agg_type="sym")
    mesh = make_mesh((1,), ("graph",), devices=jax.devices()[:1])

    eq = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(g.n_pad, H)), jnp.float32)

    def lower(fn, label):
        def loss(a, b):
            return jnp.sum(fn(a, b) * w)

        hlo = (jax.jit(jax.grad(loss, argnums=(0, 1)))
               .lower(eq, eq).compile().as_text())
        fname = f"/tmp/hlo_{label.split()[0].replace('@', '_')}.txt"
        with open(fname, "w") as fh:
            fh.write(hlo)
        log(f"[dumped {fname}: {len(hlo.splitlines())} lines]")
        return summarize(hlo, label)

    lower(lambda a, b: ell_sir_aggregate(fg, a, b, jnp.tanh, "sym",
                                         static_scale=True),
          "single-device")
    f_sh = make_sharded_sir_aggregate_pallas(sfg, jnp.tanh, mesh)
    lower(f_sh, "sharded@1 (unit path)")

    log(f"plan slots: single dst={fg.dst_plan.num_slots} "
        f"src={fg.src_plan.num_slots} "
        f"s2={'yes' if fg.dst_plan.s2_gather is not None else 'no'}; "
        f"sharded dst={sfg.dst_plan.slot_edge.shape[1]} "
        f"src={sfg.src_plan.slot_edge.shape[1]} "
        f"s2={'yes' if sfg.dst_plan.s2_gather is not None else 'no'}")
    log(f"buckets single dst: {fg.dst_plan.buckets1}")
    log(f"buckets sharded dst: {sfg.dst_plan.buckets1}")
    log(f"buckets single src: {fg.src_plan.buckets1}")
    log(f"buckets sharded src: {sfg.src_plan.buckets1}")


if __name__ == "__main__":
    main()
