# SPDX-License-Identifier: Apache-2.0
from . import m_bucket
from .m_bucket import M_MAXVAL, set_autotune_setting


def get_closest_m(M: int) -> int:
    """Delegates to the LIVE m_bucket.get_closest_m so a user's
    set_autotune_setting rebinding is visible through this re-export too."""
    return m_bucket.get_closest_m(M)
