"""jit variant for programs that mix float64 math with Pallas TPU kernels.

This package enables jax_enable_x64 globally (geometry/scoring math needs
C-double semantics in places), but Mosaic re-traces small proxy functions
at LOWERING time (reductions like any/min/max) under the ambient dtype
config and emits f64 constants it cannot lower ("64-bit types are not
supported").  Wrapping the whole call in enable_x64(False) instead breaks
the f64 parts at trace time.

Solution: trace under the ambient (x64-on) config so f64 semantics are
baked into the jaxpr, then lower + compile under enable_x64(False) so the
Mosaic proxies trace in 32-bit.  Plain jax.jit cannot split these phases,
so this helper drives the AOT API with its own executable cache.
"""

from __future__ import annotations

import numpy as np


def jit_mosaic(fn):
    """jax.jit(fn), but lowering/compiling runs under enable_x64(False).

    The returned callable cannot be invoked inside another jit trace
    (compiled executables don't inline) — use it only at the outermost
    entry point of a program that contains a Pallas kernel.
    """
    import jax

    jfn = jax.jit(fn)
    cache: dict = {}

    def call(*args):
        leaves, treedef = jax.tree_util.tree_flatten(args)
        key = (treedef, tuple(
            (np.shape(leaf), np.result_type(leaf).str) for leaf in leaves))
        compiled = cache.get(key)
        if compiled is None:
            traced = jfn.trace(*args)
            with jax.enable_x64(False):
                compiled = traced.lower().compile()
            cache[key] = compiled
        return compiled(*args)

    return call
