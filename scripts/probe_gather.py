#!/usr/bin/env python
"""Probe: which per-lane gather primitives does Mosaic support on this TPU?

Tests candidate implementations of out[s, l] = table[idx[s, l]] for a
(8, 128) index block and small node tables — the primitive that would turn
the union-sweep BVH traversal into true per-lane traversal.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS, LANES = 8, 128


def run(name, fn, *args):
    try:
        out = jax.block_until_ready(fn(*args))
        # correctness check
        return out
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return None


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (LANES,), jnp.float32)  # 128-entry table
    idx = jax.random.randint(jax.random.PRNGKey(1), (BS, LANES), 0, LANES,
                             jnp.int32)
    want = np.asarray(table)[np.asarray(idx)]

    # --- 1: jnp.take inside kernel, 1D table ---
    def k1(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    def f1(table, idx):
        return pl.pallas_call(
            k1,
            out_shape=jax.ShapeDtypeStruct((BS, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    out = run("take_1d", jax.jit(f1), table, idx)
    if out is not None:
        ok = np.allclose(np.asarray(out), want)
        print("take_1d: OK" if ok else "take_1d: WRONG")

    # --- 2: take_along_axis with 2D table broadcast across sublanes ---
    table2 = jnp.broadcast_to(table[None, :], (BS, LANES))

    def k2(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    def f2(table2, idx):
        return pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct((BS, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table2, idx)

    out = run("take_along_axis_lane", jax.jit(f2), table2, idx)
    if out is not None:
        ok = np.allclose(np.asarray(out), want)
        print("take_along_axis_lane: OK" if ok else "take_along_axis_lane: WRONG")

    # --- 3: 1024-entry table as (8,128), two-step: gather along lanes then
    # select sublane via 8-way compare  ---
    tab1024 = jax.random.normal(key, (BS, LANES), jnp.float32)
    idx1024 = jax.random.randint(jax.random.PRNGKey(2), (BS, LANES), 0,
                                 BS * LANES, jnp.int32)
    want1024 = np.asarray(tab1024).reshape(-1)[np.asarray(idx1024)]

    def k3(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        lane = idx % LANES
        sub = idx // LANES
        acc = jnp.zeros((BS, LANES), jnp.float32)
        for s in range(BS):
            row = jax.lax.slice(tab_ref[:], (s, 0), (s + 1, LANES))
            row = jnp.broadcast_to(row, (BS, LANES))
            g = jnp.take_along_axis(row, lane, axis=1)
            acc = jnp.where(sub == s, g, acc)
        out_ref[:] = acc

    def f3(tab, idx):
        return pl.pallas_call(
            k3,
            out_shape=jax.ShapeDtypeStruct((BS, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    out = run("take1024_2step", jax.jit(f3), tab1024, idx1024)
    if out is not None:
        ok = np.allclose(np.asarray(out), want1024)
        print("take1024_2step: OK" if ok else "take1024_2step: WRONG")

    # --- 4: timing: gather-heavy loop (simulate traversal step cost) ---
    C = 11  # node components

    def k4(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        acc = jnp.zeros((BS, LANES), jnp.float32)

        def body(i, carry):
            acc, idx = carry
            vals = []
            for c in range(C):
                row = jnp.broadcast_to(
                    jax.lax.slice(tab_ref[:], (c, 0), (c + 1, LANES)),
                    (BS, LANES))
                vals.append(jnp.take_along_axis(row, idx, axis=1))
            s = vals[0]
            for v in vals[1:]:
                s = s + v
            acc = acc + s
            idx = (idx + 1) % LANES
            return acc, idx

        acc, _ = jax.lax.fori_loop(0, 1000, body, (acc, idx))
        out_ref[:] = acc

    tabC = jax.random.normal(key, (C, LANES), jnp.float32)

    def f4(tab, idx):
        return pl.pallas_call(
            k4,
            out_shape=jax.ShapeDtypeStruct((BS, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    fj = jax.jit(f4)
    out = run("gather_loop_timing", fj, tabC, idx)
    if out is not None:
        t0 = time.perf_counter()
        for _ in range(10):
            out = fj(tabC, idx)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        # 1000 iters x 11 gathers of (8,128)
        print(f"gather_loop: {dt*1e6:.1f} us for 1000x{C} gathers "
              f"=> {dt*1e9/1000:.1f} ns/step ({dt*1e9/1000/C:.2f} ns/gather)")


if __name__ == "__main__":
    main()
