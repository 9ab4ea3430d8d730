"""Parallel runtime substrate.

Two distinct layers (see SURVEY.md section 2.3/2.4):

* :mod:`driftscan_tpu.parallel.comm` — *process-level* coordination verbs
  (rank/size/barrier/split/partition/gather) replacing ``caput.mpiutil``.
  In the single-controller JAX model there is one Python process per host;
  within a host all devices are driven by one process, so most verbs
  degrade to trivial behaviour in the common single-host case, and ride
  ``jax.experimental.multihost_utils`` across hosts.

* :mod:`driftscan_tpu.parallel.mesh` — *device-level* sharding: the
  ``jax.sharding.Mesh`` over which the batched per-m / per-(freq,baseline)
  compute is pjit-sharded.  This replaces the reference's MPI rank loop as
  the primary scaling axis.
"""

from . import comm, mesh  # noqa: F401
