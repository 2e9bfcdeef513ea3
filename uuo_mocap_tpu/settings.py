"""Global constants (reference ``utils/settings.py``)."""

# Marker center sits 9.5 mm off the body surface (SOMA convention);
# reference ``utils/settings.py:1``.
MARKER_DISTANCE = 0.0095
