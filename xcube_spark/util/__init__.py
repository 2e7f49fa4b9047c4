"""Utility layer: extension registry + plugin discovery."""
