"""Roofline diagnosis of the 4096-matmul anchor + lml_grad device profile.

DESIGN.md §9 anchored utilization on a bare 4096^3 f32 matmul at ~2.8 ms
(~49 TF/s — only ~25% of a v5e's 197 TF/s bf16 peak) without explaining
why.  This script answers the question two independent ways:

1. **Precision/dtype ladder** (device-loop timing, floor-subtracted, the
   bench.py methodology): the same matmul at explicit precisions —
   f32 inputs at DEFAULT / tensorfloat32 / float32(=HIGHEST), and bf16
   inputs at DEFAULT.  On a v5e the MXU passes per precision are 1 / 3 /
   6, so if the anchor is real compute the ladder must scale ~1:3:6 and
   bf16-in must approach 2*4096^3/197e12 = 0.70 ms.  A flat ladder would
   mean a harness/tunnel clamp contaminating every vs_xla claim.

2. **Device trace** (jax.profiler via utils.profiling.device_trace,
   parsed offline with xprof): actual on-device op durations for (a) the
   looped bare matmul and (b) the looped n=4096 LML+gradient — what
   fraction of the headline path is convolution/matmul (MXU) vs fusion
   (VPU) vs the serialized Pallas Cholesky chain.

Prints one JSON line; the trace directory is left under
benchmarks/traces/ for offline xprof/TensorBoard inspection.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import DEVICE_REPS, build_problem, device_loop_time  # noqa: E402

TRACE_ROOT = Path(__file__).resolve().parent / "traces"


def tf_per_sec(n: int, ms: float) -> float:
    return 2.0 * n**3 / (ms * 1e-3) / 1e12


def matmul_ladder(n: int = 4096):
    """Floor-subtracted per-matmul ms at each precision/dtype."""
    rng = np.random.default_rng(0)
    a32 = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    b32 = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    a16 = a32.astype(jnp.bfloat16)
    b16 = b32.astype(jnp.bfloat16)
    floor = device_loop_time(lambda a: a * 1.0000001, jnp.ones((8, 128)))

    out = {"floor_ms": round(floor, 3)}

    def mm(prec):
        return lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), precision=prec
        )

    for label, f, args in [
        ("f32_default", mm(jax.lax.Precision.DEFAULT), (a32, b32)),
        ("f32_tf32", mm("tensorfloat32"), (a32, b32)),
        ("f32_highest", mm(jax.lax.Precision.HIGHEST), (a32, b32)),
        ("bf16_default", mm(jax.lax.Precision.DEFAULT), (a16, b16)),
    ]:
        ms = device_loop_time(f, *args) - floor
        out[label] = {"ms": round(ms, 3), "tf_per_sec": round(tf_per_sec(n, ms), 1)}

    # size scaling at default precision: a fixed overhead shows up as
    # rising TF/s with n; a compute ceiling is flat
    for ns in (2048, 8192):
        a = jnp.asarray(rng.normal(size=(ns, ns)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(ns, ns)), jnp.float32)
        ms = device_loop_time(mm(jax.lax.Precision.DEFAULT), a, b) - floor
        out[f"f32_default_n{ns}"] = {
            "ms": round(ms, 3),
            "tf_per_sec": round(tf_per_sec(ns, ms), 1),
        }
    return out


def looped(f, *args, reps: int = DEVICE_REPS):
    """The bench.py serialized-loop program, reusable under a trace."""

    @jax.jit
    def run(*args):
        def body(c, _):
            out = f(*jax.tree.map(lambda a: a + jnp.asarray(1e-30, a.dtype) * c, args))
            s = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in jax.tree.leaves(out))
            return s, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return c

    return run


def capture_traces():
    """One traced dispatch each of the looped matmul and looped lml_grad."""
    from gogp_tpu.models.params import gp_observe
    from gogp_tpu.utils.profiling import device_trace

    n = 4096
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    mm = looped(lambda x, y: x @ y)
    float(mm(a, b))  # compile outside the trace

    gp, x, y, v = build_problem(n, jnp.float32)
    lg = looped(lambda v: jax.value_and_grad(lambda v: gp_observe(gp, v, x=x, y=y))(v))
    float(lg(v))

    dirs = {}
    for name, fn, args in [("matmul", mm, (a, b)), ("lml_grad", lg, (v,))]:
        d = TRACE_ROOT / name
        d.mkdir(parents=True, exist_ok=True)
        with device_trace(str(d)):
            float(fn(*args))
        dirs[name] = str(d)
    return dirs


def parse_trace(log_dir: str, reps: int = DEVICE_REPS):
    """Total device time per op category from the xplane, via xprof."""
    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        return {"error": "no xplane.pb found"}
    from xprof.convert import raw_to_tool_data as rtd

    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data([paths[-1]], f"{tool}^", {})
            out = {"tool": tool, "per_op_ms": {}}
            if tool == "framework_op_stats":
                import gzip
                import io

                raw = data
                if isinstance(raw, bytes):
                    try:
                        raw = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
                    except OSError:
                        pass
                    raw = raw.decode("utf-8", "replace")
                out["raw_head"] = raw[:2000]
            else:
                out["raw_head"] = str(data)[:2000]
            return out
        except Exception as e:  # noqa: BLE001 — best-effort tool probing
            last = f"{tool}: {type(e).__name__}: {e}"
    return {"error": last}


def main():
    result = {"platform": jax.devices()[0].platform, "metric": "roofline_profile"}
    result["ladder"] = matmul_ladder()
    lad = result["ladder"]
    # ladder verdict: real-compute scaling is ~1:3:6 across passes
    if "f32_default" in lad and "f32_tf32" in lad and "f32_highest" in lad:
        d, t, h = (lad[k]["ms"] for k in ("f32_default", "f32_tf32", "f32_highest"))
        result["pass_ratio"] = [1.0, round(t / d, 2), round(h / d, 2)]
    dirs = capture_traces()
    result["trace_dirs"] = dirs
    result["trace_parse"] = {k: parse_trace(v) for k, v in dirs.items()}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
