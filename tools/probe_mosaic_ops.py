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


def timed_probes():
    """Timed formulation probes for the fused decode kernel's attention:
    which logits/pv matmul orientation is fast under Mosaic at decode
    shapes. Differential scan timing; run on real hardware."""
    import functools
    import time

    B2, CK2, C2, H2 = 64, 128, 1024, 16

    def timeit(name, make_kernel, arg_shapes, out_shape, reps=256):
        args = [jnp.ones(s, jnp.bfloat16) for s in arg_shapes]
        call = pl.pallas_call(
            make_kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        # scalar feedback keeps a data dependency so the call cannot be
        # hoisted out of the scan
        @functools.partial(jax.jit, static_argnums=(1,))
        def chain(a0, n, rest):
            def body(carry, _):
                out = call((a0 + carry).astype(jnp.bfloat16), *rest)
                return out.ravel()[0].astype(jnp.float32) * 1e-9, ()
            y, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return y

        try:
            a0, rest = args[0].astype(jnp.float32), tuple(args[1:])
            np.asarray(chain(a0, reps, rest))
            np.asarray(chain(a0, 3 * reps, rest))
            t0 = time.perf_counter(); np.asarray(chain(a0, reps, rest))
            t1 = time.perf_counter(); np.asarray(chain(a0, 3 * reps, rest))
            t2 = time.perf_counter()
            us = ((t2 - t1) - (t1 - t0)) / (2 * reps) * 1e6
            print(f"TIME  {name}: {us:8.2f} us/call")
        except Exception as e:
            print(f"FAIL  {name}: {str(e).splitlines()[0][:110]}")

    # o1: logits as (B, ck, H) — batched dot, M=ck rows per batch
    def o1(k_ref, q_ref, o_ref):
        o_ref[:, :, :] = jax.lax.dot_general(
            k_ref[:, :, :], q_ref[:, :, :], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    timeit("logits o1 (B,ck,C)x(B,C,H)", o1,
           [(B2, CK2, C2), (B2, C2, H2)], (B2, CK2, H2))

    # o2: logits as (B, H, ck) — batched dot, M=H rows per batch
    def o2(q_ref, k_ref, o_ref):
        o_ref[:, :, :] = jax.lax.dot_general(
            q_ref[:, :, :], k_ref[:, :, :], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    timeit("logits o2 (B,H,C)x(B,ck,C)", o2,
           [(B2, H2, C2), (B2, CK2, C2)], (B2, H2, CK2))

    # p_exp via (B*ck, H) collapse + unbatched mask matmul
    def pe(p_ref, m_ref, o_ref):
        b_, ck_, h_ = p_ref.shape
        o_ref[:, :, :] = jax.lax.dot_general(
            p_ref[:, :, :].reshape(b_ * ck_, h_), m_ref[:, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(b_, ck_, C2)
    timeit("p_exp collapse (B*ck,H)x(H,C)", pe,
           [(B2, CK2, H2), (H2, C2)], (B2, CK2, C2))

    # pv batched: (B,H,ck) x (B,ck,C) -> (B,H,C)
    def pv(p_ref, v_ref, o_ref):
        o_ref[:, :, :] = jax.lax.dot_general(
            p_ref[:, :, :], v_ref[:, :, :], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    timeit("pv batched (B,H,ck)x(B,ck,C)", pv,
           [(B2, H2, CK2), (B2, CK2, C2)], (B2, H2, C2))


if __name__ == "__main__":
    main()
    timed_probes()
