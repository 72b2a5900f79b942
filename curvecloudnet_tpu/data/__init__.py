"""Data layer: dataset loaders, curve extraction, augmentation, synthesis."""
