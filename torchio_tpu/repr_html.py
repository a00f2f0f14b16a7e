"""Jupyter HTML cards with base64-embedded preview plots.

Parity reference: ``/root/reference/src/torchio/repr_html.py``.
"""

from __future__ import annotations

import base64
import html
import io


def _preview_png(image) -> str | None:
    try:
        from .visualization import plot_image

        fig = plot_image(image, show=False)
        buffer = io.BytesIO()
        fig.savefig(buffer, format="png", dpi=72, bbox_inches="tight")
        import matplotlib.pyplot as plt

        plt.close(fig)
        return base64.b64encode(buffer.getvalue()).decode()
    except Exception:
        return None


def _card(title: str, rows: list[tuple[str, str]], png: str | None) -> str:
    row_html = "".join(
        f"<tr><td style='padding:0 8px;color:#666'>{html.escape(k)}</td>"
        f"<td style='padding:0 8px'><code>{html.escape(v)}</code></td></tr>"
        for k, v in rows
    )
    img_html = (
        f"<img src='data:image/png;base64,{png}' style='max-width:420px'/>"
        if png
        else ""
    )
    return (
        "<div style='border:1px solid #ddd;border-radius:8px;padding:8px;"
        "margin:4px;display:inline-block;font-family:sans-serif'>"
        f"<b>{html.escape(title)}</b><table>{row_html}</table>{img_html}</div>"
    )


def _human_bytes(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024 or unit == "GiB":
            return f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} GiB"  # pragma: no cover


def image_repr_html(image, *, name: str | None = None) -> str:
    rows = []
    try:
        rows.append(("shape", str(image.shape)))
        rows.append(("spacing", ", ".join(f"{s:.2f}" for s in image.spacing)))
        rows.append(("orientation", "".join(image.orientation) + "+"))
        rows.append(("dtype", str(image.dtype)))
        rows.append(("status", "loaded" if image.is_loaded else "lazy"))
        origin = image.affine.origin
        rows.append(("origin", ", ".join(f"{v:.1f}" for v in origin)))
        import numpy as _np

        nbytes = float(
            _np.prod(image.shape) * _np.dtype(str(image.dtype)).itemsize
        )
        rows.append(("memory", _human_bytes(nbytes)))
        if image.path is not None:
            rows.append(("path", str(image.path)))
        if getattr(image, "points", None):
            rows.append(("points", ", ".join(image.points)))
        if getattr(image, "bounding_boxes", None):
            rows.append(("bounding boxes", ", ".join(image.bounding_boxes)))
        if image.applied_transforms:
            rows.append(
                ("history", " → ".join(t.name for t in image.applied_transforms))
            )
    except Exception as error:  # pragma: no cover
        rows.append(("error", str(error)))
    png = _preview_png(image) if image.is_loaded or image.path else None
    title = type(image).__name__ if name is None else f"{name} — {type(image).__name__}"
    return _card(title, rows, png)


def subject_repr_html(subject) -> str:
    cards = [
        image_repr_html(img, name=name) for name, img in subject.images.items()
    ]
    meta_rows = [(k, repr(v)) for k, v in subject.metadata.items()]
    meta_rows.insert(0, ("images", ", ".join(subject.images)))
    try:
        if subject.points:
            meta_rows.append(("points", ", ".join(subject.points)))
        if subject.bounding_boxes:
            meta_rows.append(
                ("bounding boxes", ", ".join(subject.bounding_boxes))
            )
        if subject.applied_transforms:
            meta_rows.append(
                (
                    "history",
                    " → ".join(t.name for t in subject.applied_transforms),
                )
            )
    except Exception:  # pragma: no cover
        pass
    header = _card("Subject", meta_rows, None)
    return header + "".join(cards)
