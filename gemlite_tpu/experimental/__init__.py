# SPDX-License-Identifier: Apache-2.0
from .odd_bits import OddBitLinear, A16W3, A16W5
