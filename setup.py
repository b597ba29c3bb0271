"""Setuptools shim.

Metadata lives in pyproject.toml. This file exists so `pip install -e .`
works in minimal environments that lack the `wheel` package (pip then
falls back to the legacy `setup.py develop` editable path instead of the
PEP 660 build_editable hook, which requires bdist_wheel).
"""

from setuptools import setup

setup()
