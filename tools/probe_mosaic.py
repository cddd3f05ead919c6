"""Probe Mosaic support for three primitives the fused kernels need."""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_dim0_dot():
    """dot_general contracting dim0 of LHS (A^T @ B on the MXU)."""
    def kernel(a_ref, b_ref, out_ref):
        out_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    a = jnp.arange(256 * 64, dtype=jnp.bfloat16).reshape(256, 64) % 7
    b = jnp.arange(256 * 128, dtype=jnp.bfloat16).reshape(256, 128) % 5
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
    )(a, b)
    ref = np.asarray(a, np.float32).T @ np.asarray(b, np.float32)
    ok = np.array_equal(np.asarray(out), ref)
    print(f"dim0-contraction dot: {'OK' if ok else 'WRONG'}", flush=True)


def probe_1d_dma():
    """DMA from a flat 1-D HBM ref at an arbitrary dynamic offset."""
    def kernel(off_ref, src_ref, out_ref, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(
            src_ref.at[pl.ds(off_ref[t], 256)], out_ref, sem)
        dma.start()
        dma.wait()

    src = jnp.arange(5000, dtype=jnp.int32)
    offs = jnp.asarray([137], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())])
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((256,), jnp.int32))(offs, src)
    ok = np.array_equal(np.asarray(out), np.arange(137, 137 + 256))
    print(f"1-D HBM arbitrary-offset DMA: {'OK' if ok else 'WRONG'}", flush=True)


def probe_flatten():
    """In-kernel (n, 128) -> (1, n*128) sublane-to-lane reshape."""
    def kernel(in_ref, out_ref):
        out_ref[...] = in_ref[...].reshape(1, 4 * 128)

    x = jnp.arange(4 * 128, dtype=jnp.int32).reshape(4, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 512), jnp.int32),
    )(x)
    ok = np.array_equal(np.asarray(out).reshape(-1), np.arange(512))
    print(f"sublane->lane flatten: {'OK' if ok else 'WRONG'}", flush=True)


def probe_3d_dma():
    """DMA slicing the middle dim of a 3-D HBM ref at a dynamic offset."""
    def kernel(off_ref, src_ref, out_ref, sem):
        t = pl.program_id(0)
        dma = pltpu.make_async_copy(
            src_ref.at[:, pl.ds(off_ref[t], 4), :], out_ref, sem)
        dma.start()
        dma.wait()

    src = jnp.arange(8 * 64 * 128, dtype=jnp.int32).reshape(8, 64, 128)
    offs = jnp.asarray([13], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())])
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 4, 128), jnp.int32))(offs, src)
    ok = np.array_equal(np.asarray(out), np.asarray(src)[:, 13:17, :])
    print(f"3-D middle-dim DMA: {'OK' if ok else 'WRONG'}", flush=True)


if __name__ == "__main__":
    for name in sys.argv[1:] or ["dim0_dot", "1d_dma", "flatten", "3d_dma"]:
        try:
            globals()["probe_" + name]()
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


def probe_lane_write():
    """Static lane-offset write at a non-128 multiple (64)."""
    def kernel(in_ref, out_ref):
        out_ref[...] = jnp.zeros((128, 256), jnp.int32)
        out_ref[:, 64:112] = in_ref[...]

    x = jnp.arange(128 * 48, dtype=jnp.int32).reshape(128, 48)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 256), jnp.int32),
    )(x)
    ok = np.array_equal(np.asarray(out)[:, 64:112], np.asarray(x))
    print(f"lane-offset write @64: {'OK' if ok else 'WRONG'}", flush=True)


def probe_lane_concat():
    """jnp.concatenate along lanes of 48-wide pieces."""
    def kernel(in_ref, out_ref):
        x = in_ref[...]
        out_ref[...] = jnp.concatenate([x, x + 1, x + 2, x + 3], axis=1)

    x = jnp.arange(128 * 48, dtype=jnp.int32).reshape(128, 48)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 192), jnp.int32),
    )(x)
    ref = np.concatenate([np.asarray(x) + i for i in range(4)], axis=1)
    ok = np.array_equal(np.asarray(out), ref)
    print(f"lane concat 4x48: {'OK' if ok else 'WRONG'}", flush=True)


def probe_flatten_big():
    """(544, 8) -> (1, 4352) flatten (place-stage word grid)."""
    def kernel(in_ref, out_ref):
        out_ref[...] = in_ref[...].reshape(1, 544 * 8)

    x = jnp.arange(544 * 8, dtype=jnp.int32).reshape(544, 8)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 4352), jnp.int32),
    )(x)
    ok = np.array_equal(np.asarray(out).reshape(-1), np.arange(4352))
    print(f"flatten (544,8)->(1,4352): {'OK' if ok else 'WRONG'}", flush=True)
