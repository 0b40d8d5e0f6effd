"""Interactive demo: controller + optional Tk GUI."""
