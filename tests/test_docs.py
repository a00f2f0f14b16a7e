"""Docs-as-tests: execute every ``python`` code block in README/docs.

Mirrors the reference's ``pytest --codeblocks docs/`` gate
(reference tox.ini docs-test env; SURVEY.md section 4.8): documentation
snippets must actually run against the current API. Blocks run inside a
namespace pre-seeded with the objects the prose assumes (a subject on
disk, a toy model, a mesh-sized batch array), so the snippets can stay
natural. Mark a block non-executable with ``<!-- docs-test: skip -->``
on the line before the fence.
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import numpy as np
import pytest

import torchio_tpu as tio

REPO = Path(__file__).resolve().parent.parent
DOC_FILES = sorted(
    [REPO / "README.md", *(REPO / "docs").rglob("*.md")],
    key=lambda p: str(p),
)

_FENCE = re.compile(r"^```python\s*$")
_SKIP = re.compile(r"docs-test:\s*skip")


def collect_blocks(path: Path):
    """Yield (start_line, source) for each runnable python block."""
    lines = path.read_text().splitlines()
    blocks = []
    i = 0
    while i < len(lines):
        if _FENCE.match(lines[i]):
            skip = i > 0 and bool(_SKIP.search(lines[i - 1]))
            start = i + 1
            body = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                body.append(lines[i])
                i += 1
            if not skip:
                blocks.append((start + 1, "\n".join(body)))
        i += 1
    return blocks


CASES = [
    pytest.param(path, line, src, id=f"{path.relative_to(REPO)}:{line}")
    for path in DOC_FILES
    if path.exists()
    for line, src in collect_blocks(path)
]


@pytest.fixture(scope="module")
def doc_env(tmp_path_factory):
    """Working directory + namespace the doc snippets assume."""
    import jax
    import jax.numpy as jnp

    root = tmp_path_factory.mktemp("docs")
    rng = np.random.default_rng(0)
    s = 96  # large enough for the GridSampler(patch_size=96) snippet
    t1 = tio.ScalarImage(rng.random((1, s, s, s), np.float32))
    seg = tio.LabelMap((rng.random((1, s, s, s)) > 0.7).astype(np.uint8))
    t1.save(root / "t1.nii.gz")
    seg.save(root / "seg.nii.gz")

    subject = tio.Subject(
        t1=tio.ScalarImage(root / "t1.nii.gz"),
        seg=tio.LabelMap(root / "seg.nii.gz"),
    )
    subjects = [
        tio.Subject(
            # 72^3 leaves valid 64^3-patch centers for the LabelSampler doc
            t1=tio.ScalarImage(rng.random((1, 72, 72, 72), np.float32)),
            seg=tio.LabelMap((rng.random((1, 72, 72, 72)) > 0.7).astype(np.uint8)),
        )
        for _ in range(4)
    ]
    augment = tio.Compose([tio.Flip(axes=(0,)), tio.Noise(std=0.05)])
    batch_size = 4
    namespace = {
        "tio": tio,
        "np": np,
        "jnp": jnp,
        "jax": jax,
        "subject": subject,
        "subjects": subjects,
        "batch": tio.SubjectsBatch.from_subjects(subjects * 2),  # B = 8
        "augment": augment,
        "pipeline": augment,
        "model": lambda x: x,  # toy shape-preserving "network"
        "batch_array": jnp.asarray(rng.random((4, 1, 8, 8, 8), np.float32)),
        "batch_size": batch_size,
        "seed": 0,
    }
    return root, namespace


@pytest.mark.parametrize("path,line,src", CASES)
def test_doc_block(path, line, src, doc_env, monkeypatch):
    root, namespace = doc_env
    monkeypatch.chdir(root)
    ns = dict(namespace)
    exec(compile(src, f"{path}:{line}", "exec"), ns)


def test_blocks_were_collected():
    assert len(CASES) >= 5, [str(p) for p in DOC_FILES]
