"""Bundled toy data and loaders."""

from .camelsloader import CAMELSLoader
