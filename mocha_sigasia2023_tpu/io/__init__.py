"""Motion I/O: BVH parsing/writing and the packed motion-database codec."""

from . import bvh
from .database import load_database, save_database, load_features
