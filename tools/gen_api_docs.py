"""Generate docs/reference.md from the live public API.

Walks ``torchio_tpu.__all__``, grouping classes/functions by kind, and
emits one compact entry per export: signature plus the first docstring
paragraph. Rerun after changing public signatures:

    python tools/gen_api_docs.py
"""

from __future__ import annotations

import inspect
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import torchio_tpu as tio  # noqa: E402

GROUPS = [
    ("Data containers", [
        "Image", "ScalarImage", "LabelMap", "Subject", "Study",
        "Points", "BoundingBoxes", "BoundingBoxFormat", "Representation",
        "AffineMatrix", "PatchLocation",
    ]),
    ("Batches and loading", [
        "ImagesBatch", "SubjectsBatch", "StudiesBatch",
        "SubjectsLoader", "ImagesLoader", "StudiesLoader",
        "collate_subjects", "collate_images", "collate_studies",
    ]),
    ("Transform engine", [
        "Transform", "SpatialTransform", "IntensityTransform",
        "AppliedTransform", "Compose", "OneOf", "SomeOf", "Choice",
        "apply_inverse_transform", "get_inverse_transform",
    ]),
    ("Spatial transforms", [
        "Spatial", "Resample", "Affine", "ElasticDeformation", "Flip",
        "Pad", "Crop", "CropOrPad", "EnsureShapeMultiple", "Reorient",
        "Resize", "Anisotropy", "Transpose", "CopyAffine",
        "ToReferenceSpace",
    ]),
    ("Intensity transforms", [
        "Noise", "Blur", "BiasField", "Motion", "Ghosting", "Spike",
        "Gamma", "Normalize", "RescaleIntensity", "Standardize",
        "ZNormalization", "HistogramStandardization", "LabelsToImage",
        "Swap", "Mask", "Clamp", "PCA",
    ]),
    ("Label transforms and adapters", [
        "OneHot", "RemapLabels", "RemoveLabels", "SequentialLabels",
        "Contour", "KeepLargestComponent", "Lambda", "To",
        "MonaiAdapter", "CornucopiaAdapter",
    ]),
    ("Patch pipeline", [
        "PatchSampler", "GridSampler", "UniformSampler",
        "WeightedSampler", "LabelSampler", "Queue", "PatchAggregator",
    ]),
    ("Utilities", [
        "seed", "warmup", "enable_logging", "disable_logging",
        "compute_histogram_landmarks", "read_matrix", "write_matrix",
        "read_nifti", "write_nifti", "read_header",
    ]),
]


def _signature(obj) -> str:
    try:
        target = obj.__init__ if inspect.isclass(obj) else obj
        sig = inspect.signature(target)
        params = [
            str(p)
            for name, p in sig.parameters.items()
            if name not in ("self",)
        ]
        return f"({', '.join(params)})"
    except (TypeError, ValueError):
        return "(...)"


def _first_paragraph(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    para = doc.split("\n\n")[0].replace("\n", " ").strip()
    return para


def main() -> None:
    lines = [
        "# API reference",
        "",
        "Generated from the live package by `python tools/gen_api_docs.py`",
        "— signatures and summaries for every public export. Transform",
        "constructor arguments additionally accept the randomization DSL",
        "(scalar / `(lo, hi)` / 3- or 6-tuple / `Choice` / distribution)",
        "where documented in [transform concepts](concepts/transforms.md).",
        "",
    ]
    covered: set[str] = set()
    for title, names in GROUPS:
        lines += [f"## {title}", ""]
        for name in names:
            obj = getattr(tio, name)
            covered.add(name)
            kind = "class" if inspect.isclass(obj) else "function"
            alias_of = None
            if inspect.isclass(obj) and obj.__name__ != name:
                alias_of = obj.__name__
            lines.append(f"### `{name}`")
            lines.append("")
            if alias_of:
                lines.append(f"Alias of `{alias_of}`.")
            else:
                lines.append(f"*{kind}* `{name}{_signature(obj)}`")
                para = _first_paragraph(obj)
                if para:
                    lines.append("")
                    lines.append(para)
            lines.append("")
    missing = [
        n
        for n in tio.__all__
        if n not in covered
        and not n.startswith("Type")
        and n not in ("datasets", "profiling", "random")
    ]
    if missing:
        lines += ["## Other exports", ""]
        for name in sorted(missing):
            lines.append(f"- `{name}`")
        lines.append("")
    lines += [
        "## Modules",
        "",
        "- `torchio_tpu.datasets` — downloadable sample datasets"
        " ([list](datasets.md))",
        "- `torchio_tpu.profiling` — per-transform timing and JAX"
        " profiler traces",
        "- `torchio_tpu.random` — the library RNG (`tio.seed`)",
        "- `torchio_tpu.parallel` — mesh construction, distributed"
        " subject sampling, sharded steps"
        " ([how-to](how-to/multichip.md))",
        "",
    ]
    out = REPO / "docs" / "reference.md"
    out.write_text("\n".join(lines))
    print(f"wrote {out} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
