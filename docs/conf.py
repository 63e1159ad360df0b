# Sphinx configuration (mirror of the reference docs layer,
# /root/reference/docs/conf.py — autodoc over the public classes).
import os
import sys

sys.path.insert(0, os.path.abspath(".."))

import pyskani_tpu  # noqa: E402

project = "pyskani-tpu"
author = "pyskani-tpu developers"
version = pyskani_tpu.__version__
release = version

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.intersphinx",
    "sphinx.ext.viewcode",
]

autodoc_member_order = "groupwise"
autodoc_typehints = "description"
napoleon_google_docstring = True
napoleon_numpy_docstring = True

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

html_theme = "pydata_sphinx_theme"
html_title = f"pyskani-tpu v{version}"
exclude_patterns = ["_build"]
