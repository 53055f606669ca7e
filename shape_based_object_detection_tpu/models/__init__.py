"""Flax model zoo: VGG-SSD and ResNet-FPN-RetinaNet (SURVEY.md §2 C6-C10)."""
