"""Matplotlib 3-plane visualization, subject grids, GIF/video export.

Parity reference: ``/root/reference/src/torchio/visualization.py``
(three-plane slice plots in radiological convention, label colormaps,
subject grids with shared crosshair, GIF via Pillow, MP4 via ffmpeg).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np

from .data.image import Image, LabelMap
from .data.subject import Subject


def _get_matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "Install matplotlib to use the plotting utilities"
        ) from e


def _reorient_ras(image: Image) -> np.ndarray:
    """Data reoriented to RAS+ so plots are anatomically consistent."""
    from .core.orientation import apply_orientation, axcodes2ornt, io_orientation, ornt_transform

    data = np.asarray(image.data)
    ornt = ornt_transform(
        io_orientation(image.affine.data), axcodes2ornt(("R", "A", "S"))
    )
    return apply_orientation(data, ornt)


def _slices(data: np.ndarray, indices=None):
    """Middle (or given) sagittal/coronal/axial slices of (C, I, J, K)."""
    _, si, sj, sk = data.shape
    i, j, k = indices if indices is not None else (si // 2, sj // 2, sk // 2)
    sag = data[0, i, :, :]
    cor = data[0, :, j, :]
    axi = data[0, :, :, k]
    return sag, cor, axi


def _label_cmap(num_labels: int):
    plt = _get_matplotlib()
    base = plt.get_cmap("tab10" if num_labels <= 10 else "tab20")
    from matplotlib.colors import ListedColormap

    colors = [(0, 0, 0, 0)] + [base(i % base.N) for i in range(max(num_labels, 1))]
    return ListedColormap(colors)


def plot_image(
    image: Image,
    axes=None,
    *,
    indices=None,
    cmap: str | None = None,
    output_path: str | Path | None = None,
    show: bool = True,
    title: str | None = None,
) -> Any:
    """Plot mid-volume sagittal/coronal/axial slices (radiological)."""
    plt = _get_matplotlib()
    is_label = isinstance(image, LabelMap)
    data = _reorient_ras(image)
    sag, cor, axi = _slices(data, indices)
    if axes is None:
        fig, axes = plt.subplots(1, 3, figsize=(9, 3))
    else:
        fig = axes[0].figure
    names = ("Sagittal", "Coronal", "Axial")
    spacing = image.affine.spacing
    aspects = (spacing[2] / spacing[1], spacing[2] / spacing[0], spacing[1] / spacing[0])
    if is_label:
        num = int(data.max())
        kwargs = {"cmap": _label_cmap(num), "vmin": 0, "vmax": num, "interpolation": "none"}
    else:
        kwargs = {"cmap": cmap or "gray"}
    for ax, name, plane, aspect in zip(axes, names, (sag, cor, axi), aspects):
        ax.imshow(np.rot90(plane), aspect=aspect, **kwargs)
        ax.set_title(name)
        ax.set_xticks([])
        ax.set_yticks([])
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if output_path is not None:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
    if show and output_path is None:  # pragma: no cover - interactive only
        plt.show()
    return fig


def plot_subject(
    subject: Subject,
    *,
    output_path: str | Path | None = None,
    show: bool = True,
    **kwargs: Any,
) -> Any:
    """One row of 3-plane views per image in the subject."""
    plt = _get_matplotlib()
    images = list(subject.images.items())
    if not images:
        raise RuntimeError("Subject has no images to plot")
    fig, axes = plt.subplots(len(images), 3, figsize=(9, 3 * len(images)))
    axes = np.atleast_2d(axes)
    for row, (name, image) in enumerate(images):
        plot_image(image, axes=axes[row], show=False, title=None, **kwargs)
        axes[row][0].set_ylabel(name)
    fig.tight_layout()
    if output_path is not None:
        fig.savefig(output_path, dpi=120, bbox_inches="tight")
    if show and output_path is None:  # pragma: no cover
        plt.show()
    return fig


def _frames_along_axis(image: Image, axis: int) -> list[np.ndarray]:
    data = _reorient_ras(image)[0]
    lo, hi = float(data.min()), float(data.max())
    scale = 255.0 / (hi - lo) if hi > lo else 1.0
    frames = []
    for idx in range(data.shape[axis]):
        frame = np.take(data, idx, axis=axis)
        frames.append(np.rot90((frame - lo) * scale).astype(np.uint8))
    return frames


def make_gif(
    image: Image,
    output_path: str | Path,
    *,
    axis: int = 2,
    duration_ms: int = 40,
    loop: int = 0,
) -> Path:
    """Animated GIF sweeping through slices along an axis (Pillow)."""
    try:
        from PIL import Image as PILImage
    except ImportError as e:  # pragma: no cover
        raise ImportError("Install Pillow to export GIFs") from e
    frames = [PILImage.fromarray(f) for f in _frames_along_axis(image, axis)]
    output_path = Path(output_path)
    frames[0].save(
        output_path,
        save_all=True,
        append_images=frames[1:],
        duration=duration_ms,
        loop=loop,
    )
    return output_path


def make_video(
    image: Image,
    output_path: str | Path,
    *,
    axis: int = 2,
    fps: int = 25,
) -> Path:
    """MP4 slice sweep (requires the ffmpeg binary)."""
    import shutil as _shutil
    import subprocess
    import tempfile

    if _shutil.which("ffmpeg") is None:  # pragma: no cover
        raise RuntimeError("ffmpeg binary not found; install ffmpeg for videos")
    from PIL import Image as PILImage

    output_path = Path(output_path)
    with tempfile.TemporaryDirectory() as tmp:
        for idx, frame in enumerate(_frames_along_axis(image, axis)):
            PILImage.fromarray(frame).save(f"{tmp}/{idx:05d}.png")
        subprocess.run(  # noqa: S603
            [
                "ffmpeg", "-y", "-framerate", str(fps),
                "-i", f"{tmp}/%05d.png",
                "-pix_fmt", "yuv420p",
                "-vf", "pad=ceil(iw/2)*2:ceil(ih/2)*2",
                str(output_path),
            ],
            check=True,
            capture_output=True,
        )
    return output_path
