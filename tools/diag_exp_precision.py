"""Isolate Mosaic-vs-XLA transcendental precision on real TPU.

Hypothesis for the 2.3e-4 fwd divergence (bench parity gate): jnp.exp
inside a Pallas kernel lowers to the hardware's approximate exponential,
while XLA's exp lowering is accurate to ~1 ulp.
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
import numpy as np


def _kexp(x_ref, o_ref):
    o_ref[...] = jnp.exp(x_ref[...])


def _krecip(x_ref, o_ref):
    o_ref[...] = 1.0 / x_ref[...]


def _klog(x_ref, o_ref):
    o_ref[...] = jnp.log(x_ref[...])


def main():
    # alpha-relevant range: power in [log(1/255), log(0.99)] ~ [-5.54, -0.01]
    x = jnp.linspace(-6.0, 0.0, 8 * 128 * 64).reshape(-1, 128).astype(jnp.float32)
    for name, kern, inp in [
        ("exp", _kexp, x),
        ("recip", _krecip, 1.0 - jnp.exp(x) + 1e-4),
        ("log", _klog, jnp.linspace(1e-4, 1.0, 8 * 128).reshape(-1, 128).astype(jnp.float32)),
    ]:
        f = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(inp.shape, jnp.float32)
        )
        got = np.asarray(jax.jit(f)(inp))
        want_f32 = np.asarray(jax.jit({"exp": jnp.exp, "recip": lambda v: 1.0 / v, "log": jnp.log}[name])(inp))
        want_f64 = {
            "exp": np.exp, "recip": lambda v: 1.0 / v, "log": np.log
        }[name](np.asarray(inp, np.float64))
        rel_kern = np.max(np.abs(got - want_f64) / np.maximum(np.abs(want_f64), 1e-12))
        rel_xla = np.max(np.abs(want_f32 - want_f64) / np.maximum(np.abs(want_f64), 1e-12))
        print(f"{name:6s} pallas-vs-f64 max rel {rel_kern:.3e}   xla-vs-f64 max rel {rel_xla:.3e}")


if __name__ == "__main__":
    main()
