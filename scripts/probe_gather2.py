#!/usr/bin/env python
"""Probe 2: isolate the cost of per-lane dynamic_gather on TPU."""
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
ITERS = 1000


def timeit(fj, *args, n=20):
    out = jax.block_until_ready(fj(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fj(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench(name, kernel, *arrays):
    def f(*a):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BS, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(a),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)

    fj = jax.jit(f)
    try:
        dt = timeit(fj, *arrays)
        print(f"{name}: {dt*1e6:8.1f} us total, {dt*1e9/ITERS:8.1f} ns/iter")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


def main():
    key = jax.random.PRNGKey(0)
    tab = jax.random.normal(key, (BS, LANES), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (BS, LANES), 0, LANES,
                             jnp.int32)

    # baseline: arithmetic-only loop
    def k_base(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]
        i = idx_ref[:].astype(jnp.float32)

        def body(_, acc):
            return acc * 1.0001 + t + i

        out_ref[:] = jax.lax.fori_loop(0, ITERS, body,
                                       jnp.zeros((BS, LANES), jnp.float32))

    bench("base_3ops", k_base, tab, idx)

    # single gather per iter, table held in register (per-sublane gather)
    def k_g1(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]
        idx0 = idx_ref[:]

        def body(_, carry):
            acc, idx = carry
            g = jnp.take_along_axis(t, idx, axis=1)
            return acc + g, (idx + 1) & (LANES - 1)

        acc, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((BS, LANES), jnp.float32), idx0))
        out_ref[:] = acc

    bench("gather_x1", k_g1, tab, idx)

    # 11 gathers per iter from 11 pre-broadcast register tables
    C = 11

    def k_g11(tabs_ref, idx_ref, out_ref):
        ts = [
            jnp.broadcast_to(
                jax.lax.slice(tabs_ref[:], (c, 0), (c + 1, LANES)),
                (BS, LANES))
            for c in range(C)
        ]
        idx0 = idx_ref[:]

        def body(_, carry):
            acc, idx = carry
            s = acc
            for t in ts:
                s = s + jnp.take_along_axis(t, idx, axis=1)
            return s, (idx + 1) & (LANES - 1)

        acc, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((BS, LANES), jnp.float32), idx0))
        out_ref[:] = acc

    tabs = jax.random.normal(key, (C, LANES), jnp.float32)
    bench("gather_x11_hoisted", k_g11, tabs, idx)

    # gather i8/i32: pack 4 components in i32? First check i32 gather cost
    def k_gi(tab_ref, idx_ref, out_ref):
        t = tab_ref[:].astype(jnp.int32)
        idx0 = idx_ref[:]

        def body(_, carry):
            acc, idx = carry
            g = jnp.take_along_axis(t, idx, axis=1)
            return acc + g, (idx + 1) & (LANES - 1)

        acc, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((BS, LANES), jnp.int32), idx0))
        out_ref[:] = acc.astype(jnp.float32)

    bench("gather_i32", k_gi, tab, idx)

    # MXU one-hot gather: (1024,128) onehot @ (128, 16)
    def k_mxu(tab_ref, idx_ref, out_ref):
        t16 = jnp.broadcast_to(tab_ref[:].reshape(LANES, 8)[:, :1],
                               (LANES, 16))  # fake (128,16) table
        idx0 = idx_ref[:]
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BS, LANES), 1)

        def body(_, carry):
            acc, idx = carry
            # build per-sublane onehot and matmul: not directly expressible
            # as (1024,128)@(128,16) without reshape; instead do
            # sum over 16-chunk trick: onehot (8,128) against lane table,
            # multiply-sum along lanes = a (8,128)x(8,128) elementwise +
            # reduction... emulate with dot_general over lanes:
            oh = (idx == lane_iota).astype(jnp.float32)   # (8,128)
            g = jax.lax.dot_general(
                oh, t16, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (8,16)
            acc = acc + jnp.pad(g, ((0, 0), (0, LANES - 16)))
            return acc, (idx + 1) & (LANES - 1)

        acc, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((BS, LANES), jnp.float32), idx0))
        out_ref[:] = acc

    bench("mxu_onehot_16c", k_mxu, tab, idx)


if __name__ == "__main__":
    main()
