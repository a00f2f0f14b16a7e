"""Print environment information for bug reports."""

import platform
import sys


def main() -> None:
    print(f"platform: {platform.platform()}")
    print(f"python:   {sys.version.split()[0]}")
    try:
        import torchio_tpu

        print(f"torchio_tpu: {torchio_tpu.__version__}")
    except ImportError as e:
        print(f"torchio_tpu: not importable ({e})")
    try:
        import jax

        print(f"jax:      {jax.__version__}")
        print(f"devices:  {jax.devices()}")
    except Exception as e:  # pragma: no cover
        print(f"jax:      error ({e})")
    import numpy

    print(f"numpy:    {numpy.__version__}")
    try:
        from torchio_tpu import native

        print(f"libfastnifti: {'available' if native.available() else 'fallback'}")
    except Exception:
        pass


if __name__ == "__main__":
    main()
