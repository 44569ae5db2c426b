"""Compatibility shim: all metadata lives in pyproject.toml (PEP 621).

Kept so `pip install -e . --no-use-pep517` works in minimal/offline
environments whose setuptools predates the integrated bdist_wheel
(< 70.1) and where the `wheel` package can't be fetched — the PEP 660
editable path needs one of the two.
"""

from setuptools import setup

setup()
