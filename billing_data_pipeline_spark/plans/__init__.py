"""Registered query plans. Importing the submodules populates the registry."""
