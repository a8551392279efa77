"""Data pipeline: preprocessing, feature/database construction, datasets."""

from . import preprocess, windows
