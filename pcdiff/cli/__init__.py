"""Command-line entry points: train / sample / evaluate / P-FID / P-IS."""
