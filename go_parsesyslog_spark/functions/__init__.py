"""Scalar column functions (Catalyst-native wherever possible)."""
