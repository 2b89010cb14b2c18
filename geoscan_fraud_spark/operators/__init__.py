"""Engine operators: clustering, tiles, scoring, serving, data-pipeline ops."""
