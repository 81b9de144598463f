"""App layer: headless rendering, settings, EXR I/O, viewer."""
