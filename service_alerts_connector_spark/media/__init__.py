"""Stdlib-only media codecs: real binary decode paths that run in a
container with no PIL/ffmpeg, so the multimodal operators exercise actual
encode → bytes → decode round trips instead of hash stubs."""
