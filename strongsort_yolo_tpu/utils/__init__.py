"""App-layer utilities: names, colors, labels, counting, FPS, metrics."""
