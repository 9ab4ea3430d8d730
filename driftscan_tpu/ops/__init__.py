"""Numeric kernels: healpix geometry, SHT engine, beam kernels, linalg."""
