"""Timestream simulation and analysis pipeline.

Note: like the reference (/root/reference/drift/pipeline/__init__.py), this
layer is provided for completeness; large-scale production pipelines would
layer a draco-style system on top of the product core.
"""
