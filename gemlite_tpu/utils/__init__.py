# SPDX-License-Identifier: Apache-2.0
from .m_bucket import M_MAXVAL, get_closest_m, set_autotune_setting
