"""Direct unit tests for helper APIs exercised only indirectly elsewhere."""

from __future__ import annotations

import hashlib
import tarfile
import zipfile

import numpy as np
import pytest

import torchio_tpu as tio


class TestStatistics:
    def test_compute_quantile_matches_numpy(self, rng):
        from torchio_tpu.transforms._statistics import compute_quantile

        values = rng.normal(size=10_000).astype(np.float32)
        for q in (0.0, 0.25, 0.5, 0.995, 1.0):
            got = compute_quantile(values, q)
            want = float(np.quantile(values, q))
            assert abs(got - want) < 1e-4, q

    def test_compute_quantiles_vector(self, rng):
        from torchio_tpu.transforms._statistics import compute_quantiles

        values = rng.normal(size=5_000).astype(np.float32)
        qs = [0.1, 0.5, 0.9]
        got = compute_quantiles(values, qs)
        np.testing.assert_allclose(got, np.quantile(values, qs), atol=1e-4)


class TestCollate:
    def test_collate_subjects(self, rng):
        from torchio_tpu.data.loader import collate_subjects

        subjects = [
            tio.Subject(t1=tio.ScalarImage(rng.random((1, 4, 4, 4)).astype(np.float32)))
            for _ in range(3)
        ]
        batch = collate_subjects(subjects)
        assert batch.batch_size == 3
        assert batch.images["t1"].data.shape == (3, 1, 4, 4, 4)

    def test_collate_images(self, rng):
        from torchio_tpu.data.loader import collate_images

        images = [
            tio.ScalarImage(rng.random((2, 4, 4, 4)).astype(np.float32))
            for _ in range(2)
        ]
        batch = collate_images(images)
        assert batch.data.shape == (2, 2, 4, 4, 4)


class TestRegistry:
    def test_get_transform_class(self):
        from torchio_tpu.transforms.transform import get_transform_class

        assert get_transform_class("Affine") is tio.Affine
        assert get_transform_class("Noise") is tio.Noise

    def test_registered_backends_names(self):
        from torchio_tpu.io.backends import registered_backends

        names = registered_backends()
        assert any("nifti" in str(n).lower() for n in names), names


class TestUniqueLabels:
    def test_matches_numpy_unique(self, rng):
        import jax.numpy as jnp

        from torchio_tpu.transforms._utils import unique_labels

        data = rng.integers(0, 9, (4, 5, 6)).astype(np.int32)
        got = unique_labels(jnp.asarray(data))
        assert got == sorted(int(v) for v in np.unique(data))

    def test_host_fallback_for_floats(self, rng):
        from torchio_tpu.transforms._utils import unique_labels

        data = np.asarray([0.0, 2.0, 2.0, 5.0])
        assert unique_labels(data) == [0, 2, 5]


class TestDownloadUtils:
    def test_check_integrity_md5(self, tmp_path):
        from torchio_tpu.utils.download import check_integrity

        f = tmp_path / "blob.bin"
        f.write_bytes(b"hello world")
        md5 = hashlib.md5(b"hello world").hexdigest()
        assert check_integrity(f, md5)
        assert not check_integrity(f, "0" * 32)

    def test_extract_zip(self, tmp_path):
        from torchio_tpu.utils.download import extract_archive

        archive = tmp_path / "a.zip"
        with zipfile.ZipFile(archive, "w") as z:
            z.writestr("inner/data.txt", "payload")
        out = tmp_path / "out"
        extract_archive(archive, out)
        assert (out / "inner" / "data.txt").read_text() == "payload"

    def test_extract_tar(self, tmp_path):
        from torchio_tpu.utils.download import extract_archive

        src = tmp_path / "data.txt"
        src.write_text("tar-payload")
        archive = tmp_path / "a.tar.gz"
        with tarfile.open(archive, "w:gz") as t:
            t.add(src, arcname="data.txt")
        out = tmp_path / "out"
        extract_archive(archive, out)
        assert (out / "data.txt").read_text() == "tar-payload"

    def test_cache_dir_is_path(self):
        from torchio_tpu.utils.download import get_cache_dir

        d = get_cache_dir()
        assert d.name  # a real path object with a name


class TestAxes:
    def test_opposite(self):
        from torchio_tpu.core.axes import opposite

        assert opposite("R") == "L"
        assert opposite("A") == "P"
        assert opposite("S") == "I"
        assert opposite("L") == "R"


class TestRandom:
    def test_seed_reproducible_draws(self):
        tio.seed(123)
        a = tio.random.draw_seed()
        tio.seed(123)
        b = tio.random.draw_seed()
        assert a == b

    def test_randint_range(self):
        tio.seed(0)
        vals = [tio.random.randint(0, 5) for _ in range(50)]
        assert set(vals) <= set(range(5))

    def test_worker_threads_get_distinct_generators(self):
        # numpy Generators are not thread-safe; each worker thread must
        # draw from its own spawned child, never the main generator.
        import threading

        tio.seed(7)
        main_gen = tio.random.get_rng()
        seen = {}

        def worker(name):
            gen = tio.random.get_rng()
            again = tio.random.get_rng()
            seen[name] = (gen, again)

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        gens = [g for g, _ in seen.values()]
        for gen, again in seen.values():
            assert gen is again  # stable within a thread
            assert gen is not main_gen
        assert len({id(g) for g in gens}) == len(gens)  # distinct per thread

    def test_reseed_invalidates_worker_generators(self):
        import threading

        tio.seed(1)
        out = {}

        def draw(tag):
            out[tag] = tio.random.draw_seed()

        t = threading.Thread(target=draw, args=("a",))
        t.start()
        t.join()
        tio.seed(1)
        t = threading.Thread(target=draw, args=("b",))
        t.start()
        t.join()
        assert out["a"] == out["b"]  # spawn chain is deterministic per seed


class TestUpsampleVolume:
    def test_matches_torch_interpolate(self, rng):
        import torch
        import torch.nn.functional as F

        from torchio_tpu.ops.resample import upsample_volume

        x = rng.normal(size=(1, 1, 5, 6, 7)).astype(np.float32)
        got = np.asarray(upsample_volume(x, (10, 12, 14)))
        want = F.interpolate(
            torch.as_tensor(x), size=(10, 12, 14), mode="trilinear",
            align_corners=True,
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPadParsing:
    def test_parse_six_forms(self):
        from torchio_tpu.transforms.spatial.pad import parse_six

        assert parse_six(2, "Padding") == (2, 2, 2, 2, 2, 2)
        assert parse_six((1, 2, 3), "Padding") == (1, 1, 2, 2, 3, 3)
        assert parse_six((1, 2, 3, 4, 5, 6), "Padding") == (1, 2, 3, 4, 5, 6)

    def test_parse_six_rejects_bad_lengths(self):
        from torchio_tpu.transforms.spatial.pad import parse_six

        with pytest.raises(ValueError):
            parse_six((1, 2), "Padding")


class TestWarmup:
    def test_warmup_preserves_rng_and_compiles(self, rng):
        pipeline = tio.Compose(
            [tio.Flip(axes=(0,), flip_probability=0.5), tio.Noise(std=0.1)]
        )
        tio.seed(99)
        before = tio.random.get_rng().bit_generator.state
        tio.warmup(pipeline, (8, 8, 8), batch_size=2, label_keys=("seg",))
        after = tio.random.get_rng().bit_generator.state
        assert before == after  # warm-up must not consume user RNG
        # and the pipeline still works normally afterwards
        out = pipeline(np.zeros((1, 8, 8, 8), np.float32))
        assert np.asarray(out).shape == (1, 8, 8, 8)


class TestOptionalImports:
    def test_installed_module_returned(self):
        from torchio_tpu.external.imports import get_optional

        np_mod = get_optional("numpy")
        import numpy

        assert np_mod is numpy

    def test_missing_module_actionable_error(self):
        import pytest

        from torchio_tpu.external.imports import get_optional

        with pytest.raises(ImportError, match="pip install"):
            get_optional("definitely_not_a_module_xyz")

    def test_feature_named_in_error(self):
        import pytest

        from torchio_tpu.external.imports import get_optional

        with pytest.raises(ImportError, match="frobnication"):
            get_optional("definitely_not_a_module_xyz", "frobnication")

    def test_hint_table_used(self):
        import pytest

        try:
            import monai  # noqa: F401

            pytest.skip("monai installed")
        except ImportError:
            pass
        from torchio_tpu.external.imports import get_monai

        with pytest.raises(ImportError, match="pip install monai"):
            get_monai()


class TestLogging:
    def test_default_silent(self):
        import logging

        from torchio_tpu.logging import logger

        assert any(
            isinstance(h, logging.NullHandler) for h in logger.handlers
        )

    def test_enable_disable_roundtrip(self):
        import logging

        import torchio_tpu as tio
        from torchio_tpu.logging import logger

        tio.enable_logging("DEBUG", rich=False)
        try:
            assert logger.level == logging.DEBUG
            assert any(
                not isinstance(h, logging.NullHandler) for h in logger.handlers
            )
        finally:
            tio.disable_logging()

    def test_enable_rich_falls_back_cleanly(self):
        import torchio_tpu as tio

        # rich may or may not be installed; either way this must not raise
        tio.enable_logging("INFO", rich=True)
        tio.disable_logging()


class TestDownloadUtils:
    def test_check_integrity_md5(self, tmp_path):
        import hashlib

        from torchio_tpu.utils.download import check_integrity

        f = tmp_path / "d.bin"
        f.write_bytes(b"payload")
        good = hashlib.md5(b"payload").hexdigest()
        assert check_integrity(f, good)
        assert not check_integrity(f, "0" * 32)
        assert check_integrity(f, None)  # no checksum -> existence only
        assert not check_integrity(tmp_path / "missing.bin", good)

    def test_download_url_uses_cached_file(self, tmp_path, monkeypatch):
        import hashlib

        from torchio_tpu.utils import download as dl

        f = tmp_path / "data.bin"
        f.write_bytes(b"cached")
        md5 = hashlib.md5(b"cached").hexdigest()

        def boom(*a, **k):
            raise AssertionError("network touched despite valid cache")

        monkeypatch.setattr(dl.urllib.request, "urlretrieve", boom)
        out = dl.download_url("https://x/data.bin", tmp_path, md5=md5)
        assert out == f

    def test_download_url_fake_fetch_and_verify(self, tmp_path, monkeypatch):
        import hashlib

        from torchio_tpu.utils import download as dl

        def fake_retrieve(url, path):
            Path(path).write_bytes(b"fresh")

        from pathlib import Path

        monkeypatch.setattr(dl.urllib.request, "urlretrieve", fake_retrieve)
        md5 = hashlib.md5(b"fresh").hexdigest()
        out = dl.download_url("https://x/f.bin", tmp_path, md5=md5)
        assert out.read_bytes() == b"fresh"

    def test_download_url_bad_md5_raises(self, tmp_path, monkeypatch):
        from pathlib import Path

        import pytest

        from torchio_tpu.utils import download as dl

        monkeypatch.setattr(
            dl.urllib.request,
            "urlretrieve",
            lambda url, path: Path(path).write_bytes(b"corrupted"),
        )
        with pytest.raises(RuntimeError, match="corrupted"):
            dl.download_url("https://x/f.bin", tmp_path, md5="0" * 32)

    def test_https_to_http_retry_warns(self, tmp_path, monkeypatch):
        import urllib.error
        from pathlib import Path

        import pytest

        from torchio_tpu.utils import download as dl

        calls = []

        def fake_retrieve(url, path):
            calls.append(url)
            if url.startswith("https://"):
                raise urllib.error.URLError("tls broken")
            Path(path).write_bytes(b"over-http")

        monkeypatch.setattr(dl.urllib.request, "urlretrieve", fake_retrieve)
        with pytest.warns(RuntimeWarning, match="http"):
            out = dl.download_url("https://host/f.bin", tmp_path)
        assert calls == ["https://host/f.bin", "http://host/f.bin"]
        assert out.read_bytes() == b"over-http"

    def test_extract_zip(self, tmp_path):
        import zipfile

        from torchio_tpu.utils.download import extract_archive

        archive = tmp_path / "a.zip"
        with zipfile.ZipFile(archive, "w") as z:
            z.writestr("inner/file.txt", "hello")
        extract_archive(archive, tmp_path / "out")
        assert (tmp_path / "out" / "inner" / "file.txt").read_text() == "hello"

    def test_extract_zip_traversal_blocked(self, tmp_path):
        import zipfile

        import pytest

        from torchio_tpu.utils.download import extract_archive

        archive = tmp_path / "evil.zip"
        with zipfile.ZipFile(archive, "w") as z:
            z.writestr("../escape.txt", "gotcha")
        with pytest.raises(RuntimeError, match="escapes"):
            extract_archive(archive, tmp_path / "out")

    def test_extract_tar_gz(self, tmp_path):
        import tarfile

        from torchio_tpu.utils.download import extract_archive

        payload = tmp_path / "file.txt"
        payload.write_text("tar-data")
        archive = tmp_path / "a.tar.gz"
        with tarfile.open(archive, "w:gz") as t:
            t.add(payload, arcname="file.txt")
        extract_archive(archive, tmp_path / "out")
        assert (tmp_path / "out" / "file.txt").read_text() == "tar-data"

    def test_extract_plain_gz(self, tmp_path):
        import gzip

        from torchio_tpu.utils.download import extract_archive

        archive = tmp_path / "v.bin.gz"
        with gzip.open(archive, "wb") as f:
            f.write(b"unzipped")
        out = extract_archive(archive)
        assert out.name == "v.bin"
        assert out.read_bytes() == b"unzipped"

    def test_unknown_archive_raises(self, tmp_path):
        import pytest

        from torchio_tpu.utils.download import extract_archive

        f = tmp_path / "x.rar"
        f.write_bytes(b"??")
        with pytest.raises(ValueError, match="Unknown archive"):
            extract_archive(f)


class TestSortFreeQuantiles:
    """The count-based order-statistic kernel must match jnp.quantile
    (linear interpolation) exactly across data regimes."""

    @pytest.fixture
    def cases(self, rng):
        return [
            rng.normal(size=50_000).astype(np.float32) * 100 - 3,
            rng.integers(-50, 50, 50_000).astype(np.float32),  # heavy ties
            np.array([1.0, 2.0, 3.0], np.float32),
            np.array([5.0], np.float32),
            rng.random(1000).astype(np.float32) * 1e30,        # huge range
            -rng.random(1000).astype(np.float32),              # all negative
            np.zeros(100, np.float32),                          # constant
        ]

    def test_matches_jnp_quantile(self, cases):
        import jax.numpy as jnp

        from torchio_tpu.transforms._statistics import compute_quantile

        for data in cases:
            for q in (0.0, 0.005, 0.25, 0.5, 0.75, 0.995, 1.0):
                ours = compute_quantile(data, q)
                ref = float(jnp.quantile(jnp.asarray(data), q))
                assert abs(ours - ref) <= max(1e-5 * abs(ref), 1e-6), (
                    q,
                    ours,
                    ref,
                )

    def test_vector_form_one_call(self, rng):
        import numpy as np

        from torchio_tpu.transforms._statistics import compute_quantiles

        data = rng.normal(size=10_000).astype(np.float32)
        qs = [0.01, 0.1, 0.5, 0.9, 0.99]
        ours = compute_quantiles(data, qs)
        ref = np.quantile(data, qs)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_nan_ignored(self, rng):
        from torchio_tpu.transforms._statistics import compute_quantiles

        d = rng.normal(size=10_000).astype(np.float32)
        masked = np.where(rng.random(10_000) > 0.5, d, np.nan).astype(
            np.float32
        )
        ours = compute_quantiles(masked, [0.1, 0.9])
        ref = np.nanquantile(masked, [0.1, 0.9])
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


# --- consolidated from test_coverage_edges2.py (round 5) ---
import gzip
import warnings
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio


class TestRandomEdges:
    def test_choice_wrapper(self):
        from torchio_tpu.random import choice

        vals = choice(np.arange(10), size=3, p=np.full(10, 0.1))
        assert len(vals) == 3


# --- consolidated from test_coverage_edges4.py (round 5) ---
import copy
import sys
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torchio_tpu as tio
from torchio_tpu.core.affine import AffineMatrix
from torchio_tpu.data import LabelMap, ScalarImage, Subject


class TestConfigEdges:
    def test_pallas_env_override(self, monkeypatch):
        from torchio_tpu import config

        monkeypatch.setenv("TORCHIO_TPU_PALLAS", "0")
        assert config.pallas_resample_enabled() is False
        monkeypatch.setenv("TORCHIO_TPU_PALLAS", "1")
        assert config.pallas_resample_enabled() is True

    def test_gather16_module_flag(self, monkeypatch):
        from torchio_tpu import config

        monkeypatch.delenv("TORCHIO_TPU_GATHER16", raising=False)
        monkeypatch.setattr(config, "use_gather16", True)
        assert config.gather16() is True

    def test_window_env_override(self, monkeypatch):
        from torchio_tpu import config

        monkeypatch.setenv("TORCHIO_TPU_WINDOW", "false")
        assert config.window_resample() is False


# --- consolidated from test_coverage_edges6.py (round 5) ---
import struct
import sys
import numpy as np
import pytest
import torchio_tpu as tio
from torchio_tpu.data import ScalarImage

def _python_jpegll_edge6(monkeypatch):
    """Force the pure-Python JPEG-lossless decoder (the oracle)."""
    import torchio_tpu.native as native

    monkeypatch.setattr(native, "jpegll_decode", lambda stream: None)

def _python_jls_edge6(monkeypatch):
    import torchio_tpu.native as native

    monkeypatch.setattr(native, "jls_decode", lambda stream: None)


class TestOptionalImportGetters:
    def test_every_getter_resolves_or_hints(self):
        # each convenience getter either returns the module or raises
        # the hint-bearing ImportError (external/imports.py)
        from torchio_tpu.external import imports as ext

        for getter in (
            ext.get_matplotlib,
            ext.get_pil,
            ext.get_zarr,
            ext.get_monai,
            ext.get_h5py,
            ext.get_ipyniivue,
        ):
            try:
                assert getter() is not None
            except ImportError as e:
                assert "Install it with" in str(e)

class TestCompilationCacheBootstrap:
    def test_setup_runs_without_env(self, monkeypatch):
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        tio._setup_compilation_cache()
        import jax

        assert jax.config.jax_compilation_cache_dir is not None
