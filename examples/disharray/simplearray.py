"""A custom telescope class, loaded as a plugin through the YAML config.

Demonstrates the framework's plugin mechanism (the reference supports the
same via ``type: {module, class, file}`` specs,
/root/reference/drift/core/manager.py:54-80): any module on disk can
provide a telescope, and the config references it by file path — no
package install needed.

This array is a square grid of polarised dishes with an Airy (uniformly
illuminated circular aperture) primary beam.
"""

import numpy as np

from driftscan_tpu import config
from driftscan_tpu.core import telescope
from driftscan_tpu.telescope.disharray import beam_circular


class GridDishArray(telescope.SimplePolarisedTelescope):
    """A square grid of polarised dishes with Airy beams.

    Attributes
    ----------
    gridu, gridv : int
        Number of dishes along the two grid directions.
    dish_width : float
        Dish diameter in metres (also the grid spacing).
    """

    freq_start = 100.0
    freq_end = 150.0
    num_freq = 5

    dish_width = config.Property(proptype=float, default=3.5)
    gridu = config.Property(proptype=int, default=4)
    gridv = config.Property(proptype=int, default=4)

    @property
    def u_width(self):
        return self.dish_width

    @property
    def v_width(self):
        return self.dish_width

    def _beam_amp(self, freq):
        return np.asarray(
            beam_circular(
                self._angpos, self.zenith, self.dish_width / self.wavelengths[freq]
            )
        )

    def beamx(self, feed, freq):
        # X feed points east-west: the field pattern lies along phi-hat.
        return self._beam_amp(freq)[:, np.newaxis] * np.array([0.0, 1.0])

    def beamy(self, feed, freq):
        # Y feed points north-south (theta-hat away from the poles).
        return self._beam_amp(freq)[:, np.newaxis] * np.array([1.0, 0.0])

    @property
    def _single_feedpositions(self):
        iu, iv = np.meshgrid(
            np.arange(self.gridu), np.arange(self.gridv), indexing="ij"
        )
        return self.dish_width * np.stack(
            [iu.ravel(), iv.ravel()], axis=1
        ).astype(np.float64)
