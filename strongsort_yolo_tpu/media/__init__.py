"""Host media layer: decode, encode, display, drawing.

The reference's media substrate is OpenCV C++ under Python
(SURVEY.md N1-N3). Here the same capability is provided with a
swappable backend: the cv2 path by default, and the native C++ shim
(native/, via media.native) for annotation when built. Drawing always
stays on the host — pixels never ride the accelerator for overlays.
"""
