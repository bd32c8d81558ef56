"""Host-side asset pipeline.

Counterpart of Runtime/AssetRegistry/: GLTF/texture/material/world import,
registry with hot reload. Loaders produce numpy/jnp arrays consumed by the
device-side pipeline; everything here runs on host Python (+ native helpers).
"""
