# SPDX-License-Identifier: Apache-2.0
"""Compute ops: the jnp reference oracle and the Pallas kernel families."""

from .reference import forward_ref, dequantize_ref
