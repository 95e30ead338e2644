"""jax.profiler integration (SURVEY §5 tracing subsystem)."""
import jax
import jax.numpy as jnp

from ibgs_tpu.utils.profiling import (annotate, step_annotation, trace,
                                      trace_files)


def test_trace_captures_xplane(tmp_path):
    d = str(tmp_path / "trace")
    f = jax.jit(lambda x: (x * 2.0).sum())
    x = jnp.arange(128.0)
    float(f(x))  # compile outside the capture window
    with trace(d):
        with step_annotation("bench_step", 0):
            with annotate("inner"):
                float(f(x))
    files = trace_files(d)
    assert files, "no .xplane.pb capture written"


def test_trace_none_is_noop():
    with trace(None):
        pass
    with trace(""):
        pass
