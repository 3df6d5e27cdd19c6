"""Named queries (driver contract). Import via registry.load_all()."""
