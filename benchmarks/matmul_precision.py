"""Speed/accuracy sweep of TPU matmul precision on the lml+grad hot path.

Findings this benchmark exists to reproduce (v5e, n=4096):

- JAX's DEFAULT f32 dot precision on TPU is ONE bf16 MXU pass — verified
  bit-identical to explicitly casting operands to bf16.  There is no
  "cast to bf16" speed headroom on the fast path; it already runs there.
- The accuracy knob is ``jax.default_matmul_precision``: it is part of
  JAX's trace context, so jit AND custom_vjp caches key on it correctly
  (a hand-rolled global flag does not reach custom_vjp's memoized
  backward trace — that bug motivated this probe).
- Mosaic kernels reject Precision.HIGH; kernel-internal dots pin
  DEFAULT/HIGHEST via cholesky_pallas._kernel_precision.

Run: python benchmarks/matmul_precision.py [N]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, "/root/repo")
from bench import build_problem, device_loop_time  # noqa: E402

from gogp_tpu.models.params import gp_observe  # noqa: E402


def x64_truth(n: int):
    """CPU x64 value/gradient via a subprocess (this process owns the TPU)."""
    import json
    import subprocess

    code = (
        "import os, json, sys; os.environ['JAX_PLATFORMS']='cpu';\n"
        "import jax; jax.config.update('jax_platforms','cpu');"
        " jax.config.update('jax_enable_x64', True)\n"
        "import jax.numpy as jnp, numpy as np; sys.path.insert(0,'/root/repo')\n"
        "from bench import build_problem\n"
        "from gogp_tpu.models.params import gp_observe\n"
        f"gp, x, y, v = build_problem({n}, jnp.float64)\n"
        "val, g = jax.value_and_grad(lambda v: gp_observe(gp, v, x=x, y=y))(v)\n"
        "print(json.dumps({'val': float(val), 'g': np.asarray(g).tolist()}))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    d = json.loads(out.stdout.strip().splitlines()[-1])
    return d["val"], np.asarray(d["g"])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    gp, x, y, v = build_problem(n, jnp.float32)
    tval, tg = x64_truth(n)

    def arm(prec):
        def f(v):
            if prec is None:
                return jax.value_and_grad(lambda v: gp_observe(gp, v, x=x, y=y))(v)
            with jax.default_matmul_precision(prec):
                return jax.value_and_grad(lambda v: gp_observe(gp, v, x=x, y=y))(v)
        return f

    floor = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)))
    for prec in [None, "tensorfloat32", "float32"]:
        f = arm(prec)
        val, g = jax.jit(f)(v)
        g = np.asarray(g)
        ms = device_loop_time(f, v) - floor
        print(
            f"prec={str(prec):15s} {ms:8.3f} ms  "
            f"val_rel={abs(float(val) - tval) / abs(tval):.2e}  "
            f"grad_maxrel={np.max(np.abs(g - tg) / (np.abs(tg) + 1e-8)):.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
