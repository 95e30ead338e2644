"""Tracing / profiling integration (SURVEY §5 aux subsystems).

The reference leans on external torch/CUDA profilers; here tracing is
first-class: `jax.profiler` device traces (viewable in Perfetto or
TensorBoard's profile plugin) can be captured around any training window
(``--profile_from_iter/--profile_num_steps``), one bench step
(``BENCH_PROFILE=<dir> python bench.py``), or ad hoc via the context
manager below.  Traces include XLA/Mosaic kernel timelines, so per-stage
rooflines (preprocess / binning / blend / epilogue) come straight from
the step annotations the train loop emits.
"""
from __future__ import annotations

import contextlib
import glob
import os

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler trace into `logdir` (no-op if falsy)."""
    if not logdir:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield


def step_annotation(name: str, step: int):
    """Label one training step in the trace timeline (cheap when idle)."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


def annotate(name: str):
    """Label a host-side region in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def trace_files(logdir: str):
    """The .xplane.pb capture files under a trace dir (for tests/tools)."""
    return sorted(glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
