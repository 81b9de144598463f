"""CLI entry point (yuki/src/main.rs).

Usage:
  python -m yuki_tpu --out=render.exr [--scene=path] [--settings=settings.yaml]
  python -m yuki_tpu --view [...]          # lightweight web viewer

Headless when --out is given, like the reference's ``--out=FILE`` flag
(main.rs:94-137); settings.yaml is read from the working directory by
default if present.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def _setup_logging() -> None:
    """fern-equivalent: stdout + yuki.log, info level (main.rs:43-65)."""
    fmt = "[%(asctime)s][yuki][%(levelname)s] %(message)s"
    logging.basicConfig(
        level=logging.INFO,
        format=fmt,
        handlers=[
            logging.StreamHandler(sys.stdout),
            logging.FileHandler("yuki.log", mode="a"),
        ],
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="yuki_tpu", description="TPU-native physically-based renderer"
    )
    parser.add_argument("--out", help="render headless into this EXR file")
    parser.add_argument("--scene", help="scene file (.ply/.xml/.pbrt)")
    parser.add_argument(
        "--settings",
        default="settings.yaml" if os.path.exists("settings.yaml") else None,
        help="yaml settings file (default: ./settings.yaml if present)",
    )
    parser.add_argument("--view", action="store_true", help="start web viewer")
    parser.add_argument(
        "--profile",
        help="capture a jax.profiler device trace of the render into this "
        "directory (view with tensorboard/xprof)",
    )
    parser.add_argument("--port", type=int, default=8000, help="viewer port")
    args = parser.parse_args(argv)

    _setup_logging()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("YUKI_TPU_CACHE", os.path.expanduser("~/.yuki_tpu_cache")),
    )

    from .app.settings import load_settings

    settings = load_settings(args.settings)
    if args.scene:
        settings.load_settings.path = args.scene

    if args.out:
        from .app import headless
        from .profiling import device_trace

        with device_trace(getattr(args, "profile", None)):
            headless.render(settings, args.out)
        return 0

    from .app import viewer

    viewer.serve(settings, port=args.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
