"""Command-line entry points: database build, training, characterization."""
