"""Visualization layer (lazy matplotlib).  See plots.py / animate.py / cli.py."""
