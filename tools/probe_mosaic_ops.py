"""Probe which Mosaic lowerings compile on this libtpu: reshapes, VMEM lane
slices, transposes — the primitives the fused decode kernel's int8-scale
handling can be built from. Each probe compiles a minimal kernel and runs it.

Run: python tools/probe_mosaic_ops.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, CK, H, T = 64, 32, 16, 768


def run(name, kernel, out_shape, arg_shapes):
    args = [jnp.arange(np.prod(s), dtype=jnp.float32).reshape(s) / 100.0
            for s in arg_shapes]
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(*args)
        np.asarray(out)
        print(f"OK    {name}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL  {name}: {msg}")
        return False


def main():
    # 1. major-collapse reshape (B, ck, H) -> (B*ck, H)
    def k1(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :, :].reshape(B * CK, H)
    run("reshape (B,ck,H)->(B*ck,H)", k1, (B * CK, H), [(B, CK, H)])

    # 2. minor-split reshape (B, ck*H) -> (B, ck, H)
    def k2(x_ref, o_ref):
        o_ref[:, :, :] = x_ref[:, :].reshape(B, CK, H)
    run("reshape (B,ck*H)->(B,ck,H)", k2, (B, CK, H), [(B, CK * H)])

    # 3. static lane slice of (B, H, T) at 32 width
    def k3(x_ref, o_ref):
        o_ref[:, :, :] = x_ref[:, :, 32:64]
    run("lane slice (B,H,T)[..,32:64]", k3, (B, H, 32), [(B, H, T)])

    # 4. dynamic lane slice via pl.ds
    def k4(x_ref, o_ref):
        s = 2 * 32
        o_ref[:, :, :] = x_ref[:, :, pl.ds(s, 32)]
    run("dyn lane slice pl.ds(64,32)", k4, (B, H, 32), [(B, H, T)])

    # 5. transpose (B, H, ck) -> (B, ck, H)
    def k5(x_ref, o_ref):
        o_ref[:, :, :] = jnp.transpose(x_ref[:, :, :], (0, 2, 1))
    run("transpose (B,H,ck)->(B,ck,H)", k5, (B, CK, H), [(B, H, CK)])

    # 6. 3D-lhs contraction: (B,H,ck) x (C,H) contract H -> (B, ck, C)
    C = 1024
    def k6(p_ref, m_ref, o_ref):
        o_ref[:, :, :] = jax.lax.dot_general(
            p_ref[:, :, :], m_ref[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    run("dot (B,H,ck)x(C,H)->(B,ck,C)", k6, (B, CK, C), [(B, H, CK), (C, H)])

    # 7. broadcast (B,1,ck) * (B,H,ck)
    def k7(x_ref, s_ref, o_ref):
        o_ref[:, :, :] = x_ref[:, :, :] * s_ref[:, :, :]
    run("bcast (B,1,ck)*(B,H,ck)", k7, (B, H, CK), [(B, H, CK), (B, 1, CK)])


if __name__ == "__main__":
    main()
