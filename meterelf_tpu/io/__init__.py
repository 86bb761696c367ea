"""Host IO: native JPEG decode and crop staging."""
