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


def image_repr_html(image) -> str:
    rows = []
    try:
        rows.append(("shape", str(image.shape)))
        rows.append(("spacing", ", ".join(f"{s:.2f}" for s in image.spacing)))
        rows.append(("orientation", "".join(image.orientation) + "+"))
        rows.append(("dtype", str(image.dtype)))
        rows.append(("status", "loaded" if image.is_loaded else "lazy"))
        if image.path is not None:
            rows.append(("path", str(image.path)))
    except Exception as error:  # pragma: no cover
        rows.append(("error", str(error)))
    png = _preview_png(image) if image.is_loaded or image.path else None
    return _card(type(image).__name__, rows, png)


def subject_repr_html(subject) -> str:
    cards = [image_repr_html(img) for img in subject.images.values()]
    meta_rows = [(k, repr(v)) for k, v in subject.metadata.items()]
    header = _card("Subject", meta_rows, None)
    return header + "".join(cards)
