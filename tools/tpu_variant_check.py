# -*- coding: utf-8 -*-
"""Mosaic compile + bit-exactness check of the round-4 kernel VARIANTS on
the real chip.

The sharded executors only ever exercise their per-position kernel
variants (x ghost columns + clamps, padded-row ext_bot, 3-D pad_row /
parity_off) in interpret mode on the virtual CPU mesh — multi-chip TPU
hardware is not available.  Mosaic, however, compiles the SAME
single-device `_window_chunk` / `_window3d_call` programs those variants
are built from, so this script drives each variant directly on the v5e
and asserts bit-equality against the interpret-mode (pure JAX) result —
the round-3 lesson that interpret mode under-checks Mosaic constraints,
applied proactively.

    python tools/tpu_variant_check.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp


def _check(tag, got, want):
    ok = np.array_equal(np.asarray(got), np.asarray(want))
    print(f"{tag}: bit-exact={ok}"
          + ("" if ok else f" maxdiff={np.abs(np.asarray(got) - np.asarray(want)).max():.3e}"))
    assert ok, tag


def main():
    print("backend:", jax.default_backend())
    from xinvert_tpu import stencil
    from xinvert_tpu.ops.pallas_sor_window import (
        _window_chunk, _stack_planes, WINDOW_COMPILER_OPTS)

    rng = np.random.default_rng(0)
    ny, nx = 256, 512
    A = (np.abs(rng.normal(1, 0.1, (ny, nx))) + 0.5).astype(np.float32)
    F = rng.normal(0, 1, (ny, nx)).astype(np.float32)
    Fdef = np.ones((ny, nx), bool)
    Fdef[40:80, 100:300] = False
    spec = stencil.standard_2d(jnp.asarray(A), 0.0, jnp.asarray(A),
                               jnp.asarray(F), jnp.asarray(Fdef),
                               (1.3, 1.0), ("extend", "fixed"))
    rel = (jnp.float32(1.4) * spec.relax).astype(jnp.float32)
    W = _stack_planes(spec, rel, ny, nx, jnp.float32)
    S = jnp.asarray(rng.normal(0, 1, (1, ny, nx)).astype(np.float32))

    call = functools.partial(_window_chunk, n=4, k_sweeps=4, tile=64)
    jit_tpu = lambda **kw: jax.jit(
        lambda W_, S_: call(spec, W_, S_, n_static=4, **kw),
        compiler_options=WINDOW_COMPILER_OPTS)(W, S)
    interp = lambda **kw: call(spec, W, S, n_static=4, interpret=True, **kw)

    # x-split variants: ghost columns + owned-column write-back + clamps.
    # (pad the operand with wrap columns so shapes match a sharded block)
    hx = 128
    Sp = jnp.concatenate([S[:, :, -hx:], S, S[:, :, :hx]], axis=2)
    Wp = jnp.concatenate([W[:, :, :, -hx:], W, W[:, :, :, :hx]], axis=3)
    for tag, kw in [
        ("x-mid (pad_x, no clamps)",
         dict(pad_x=hx, clamp_w=-1, clamp_e=-1)),
        ("x-west (clamp_w)", dict(pad_x=hx, clamp_w=hx, clamp_e=-1)),
        ("x-east (clamp_e)", dict(pad_x=hx, clamp_w=-1,
                                  clamp_e=hx + nx - 1)),
    ]:
        got = jax.jit(lambda W_, S_: call(spec, W_, S_, n_static=4, **kw),
                      compiler_options=WINDOW_COMPILER_OPTS)(Wp, Sp)
        want = call(spec, Wp, Sp, n_static=4, interpret=True, **kw)
        _check(tag, got, want)

    # padded-row ext_bot variant (non-divisible ny lift): the true domain
    # is 240 rows, padded to a tile multiple (256) with inert rows — the
    # executor's plan guarantees this divisibility
    nyt = 240
    npad = ny - nyt
    spec_b = stencil.standard_2d(
        jnp.asarray(A[:nyt]), 0.0, jnp.asarray(A[:nyt]),
        jnp.asarray(F[:nyt]), jnp.asarray(Fdef[:nyt]), (1.3, 1.0),
        ("extend", "fixed"))
    rel_b = (jnp.float32(1.4) * spec_b.relax).astype(jnp.float32)
    Wb = jnp.pad(_stack_planes(spec_b, rel_b, nyt, nx, jnp.float32),
                 ((0, 0), (0, 0), (0, npad), (0, 0)))
    Sb = jnp.pad(S[:, :nyt], ((0, 0), (0, npad), (0, 0)))
    kw = dict(ext_bot=nyt - 1)
    got = jax.jit(lambda W_, S_: call(spec_b, W_, S_, n_static=4, **kw),
                  compiler_options=WINDOW_COMPILER_OPTS)(Wb, Sb)
    want = call(spec_b, Wb, Sb, n_static=4, interpret=True, **kw)
    _check("ext_bot (padded rows)", got, want)

    # 3-D pad_row / parity_off variants
    from xinvert_tpu.ops.pallas_sor3d_window import (_window3d_call,
                                                     _stack_planes3)
    nz, ny3, nx3 = 24, 48, 144
    sh = (nz, ny3, nx3)
    A3 = ((np.abs(rng.normal(1, 0.1, sh)) + 0.5) * 2e-4).astype(np.float32)
    B3 = (np.abs(rng.normal(1, 0.1, sh)) + 0.5).astype(np.float32)
    F3 = rng.normal(0, 1e-9, sh).astype(np.float32)
    spec3 = stencil.standard_3d(jnp.asarray(A3), jnp.asarray(B3),
                                jnp.asarray(B3), jnp.asarray(F3),
                                jnp.ones(sh, bool), (5e3, 1.1e5, 1.0e5),
                                ("fixed", "extend", "periodic"))
    rel3 = (jnp.float32(1.2) * spec3.relax).astype(jnp.float32)
    nzp = 24
    W3 = _stack_planes3(spec3, rel3, nz, ny3, nx3, jnp.float32, nzp=nzp)
    hy = 8
    S3 = jnp.asarray(rng.normal(0, 1, (1,) + sh).astype(np.float32))
    S3p = jnp.concatenate([S3[:, :, -hy:], S3, S3[:, :, :hy]], axis=2)
    W3p = jnp.concatenate([W3[:, :, -hy:], W3, W3[:, :, :hy]], axis=2)
    call3 = functools.partial(_window3d_call, n=4, k_sweeps=4, tile=8)
    for tag, kw in [
        ("3d mid (pad_row)", dict(pad_row=hy, has_ytop=False,
                                  has_ybot=False)),
        ("3d top", dict(pad_row=hy, has_ytop=True, has_ybot=False)),
        ("3d bot+parity", dict(pad_row=hy, has_ytop=False, has_ybot=True,
                               parity_off=1)),
    ]:
        got = jax.jit(lambda W_, S_: call3(spec3, W_, S_, n_static=4, **kw),
                      compiler_options=WINDOW_COMPILER_OPTS)(W3p, S3p)
        want = call3(spec3, W3p, S3p, n_static=4, interpret=True, **kw)
        _check(tag, got, want)

    # round-5 3-D x-split variants: pad_col ghost columns + owned-column
    # write-back + extend corner clamps (parallel/halo_window3d.py)
    nz, ny3, nx3 = 24, 48, 256
    sh = (nz, ny3, nx3)
    A3 = ((np.abs(rng.normal(1, 0.1, sh)) + 0.5) * 2e-4).astype(np.float32)
    B3 = (np.abs(rng.normal(1, 0.1, sh)) + 0.5).astype(np.float32)
    F3 = rng.normal(0, 1e-9, sh).astype(np.float32)
    spec3x = stencil.standard_3d(jnp.asarray(A3), jnp.asarray(B3),
                                 jnp.asarray(B3), jnp.asarray(F3),
                                 jnp.ones(sh, bool), (5e3, 1.1e5, 1.0e5),
                                 ("fixed", "extend", "fixed"))
    rel3x = (jnp.float32(1.2) * spec3x.relax).astype(jnp.float32)
    W3x = _stack_planes3(spec3x, rel3x, nz, ny3, nx3, jnp.float32, nzp=nz)
    hx = 128
    S3x = jnp.asarray(rng.normal(0, 1, (1,) + sh).astype(np.float32))
    S3xp = jnp.concatenate([S3x[:, :, :, -hx:], S3x, S3x[:, :, :, :hx]],
                           axis=3)
    W3xp = jnp.concatenate([W3x[:, :, :, -hx:], W3x, W3x[:, :, :, :hx]],
                           axis=3)
    call3x = functools.partial(_window3d_call, n=4, k_sweeps=4, tile=8)
    for tag, kw in [
        ("3d x-mid (pad_col)", dict(pad_col=hx, clamp_w=-1, clamp_e=-1)),
        ("3d x-west (clamp_w)", dict(pad_col=hx, clamp_w=hx, clamp_e=-1)),
        ("3d x-east (clamp_e)", dict(pad_col=hx, clamp_w=-1,
                                     clamp_e=hx + nx3 - 1)),
    ]:
        got = jax.jit(lambda W_, S_: call3x(spec3x, W_, S_, n_static=4,
                                            **kw),
                      compiler_options=WINDOW_COMPILER_OPTS)(W3xp, S3xp)
        want = call3x(spec3x, W3xp, S3xp, n_static=4, interpret=True, **kw)
        _check(tag, got, want)
    print("OK: all round-4/5 kernel variants compile under Mosaic and "
          "match interpret mode bit for bit")


if __name__ == "__main__":
    main()
