"""Core data model: grids, fields, caches."""

from correrender_tpu.core.fields import GridMetadata, VolumeData, FieldType

__all__ = ["GridMetadata", "VolumeData", "FieldType"]
