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
