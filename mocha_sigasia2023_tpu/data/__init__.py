"""Data pipeline: preprocessing, feature/database construction, datasets."""

from . import dataset, preprocess, windows
