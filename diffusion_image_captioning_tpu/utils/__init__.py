"""Utilities: native-extension loader, profiling helpers."""
