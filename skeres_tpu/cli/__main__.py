"""`python -m skeres_tpu.cli` — list the available command-line tools."""

print(__import__("skeres_tpu.cli", fromlist=["__doc__"]).__doc__)
