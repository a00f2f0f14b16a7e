import numpy as np

import torchio_tpu as tio
from torchio_tpu import profiling


def test_profile_records_transforms(rng):
    sub = tio.Subject(
        t1=tio.ScalarImage(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    )
    with profiling.profile() as prof:
        pipeline = tio.Compose([tio.Flip(axes=0), tio.Noise(std=0.1)])
        pipeline(sub)
    assert prof.total("Flip") > 0
    assert prof.total("Noise") > 0
    report = prof.report()
    assert "Flip" in report and "Noise" in report


def test_profile_restores_forward(rng):
    original = tio.Transform.forward
    with profiling.profile():
        pass
    assert tio.Transform.forward is original


def test_report_format_and_totals(rng):
    import torchio_tpu as tio
    from torchio_tpu import profiling

    subject = tio.Subject(
        t1=tio.ScalarImage(rng.random((1, 8, 8, 8)).astype(np.float32))
    )
    with profiling.profile() as prof:
        tio.Gamma(log_gamma=0.1)(subject)
        tio.Gamma(log_gamma=0.1)(subject)
        tio.Flip(axes=(0,))(subject)
    report = prof.report()
    assert "Gamma" in report and "Flip" in report
    assert "calls" in report.splitlines()[0]
    assert prof.total("Gamma") > 0.0
    assert prof.total("NeverRan") == 0.0
    # Gamma ran twice
    assert len(prof.records["Gamma"]) == 2


def test_trace_context_writes_profile(tmp_path, rng):
    import torchio_tpu as tio
    from torchio_tpu import profiling

    subject = tio.Subject(
        t1=tio.ScalarImage(rng.random((1, 8, 8, 8)).astype(np.float32))
    )
    with profiling.trace(str(tmp_path)):
        tio.Flip(axes=(0,))(subject)
    # the jax profiler drops a plugins/profile dir with trace artifacts
    assert any(tmp_path.rglob("*")), "trace produced no artifacts"


# --- consolidated from test_coverage_edges2.py (round 5) ---
import gzip
import warnings
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio


class TestProfilingEdges:
    def test_image_result_sync_and_exception(self, rng):
        from torchio_tpu.profiling import profile

        img = tio.ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        with profile() as prof:
            tio.Flip(axes=0, p=1.0)(img)  # Image result: .data branch
        assert prof.total("Flip") >= 0.0

    def test_sync_failure_is_swallowed(self, rng, monkeypatch):
        from torchio_tpu.profiling import profile

        def boom(x):
            raise RuntimeError("sync failed")

        monkeypatch.setattr(jax, "block_until_ready", boom)
        img = tio.ScalarImage(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        with profile() as prof:
            tio.Flip(axes=0, p=1.0)(img)
        assert "Flip" in prof.records
