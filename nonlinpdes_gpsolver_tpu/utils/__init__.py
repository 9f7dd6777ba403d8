from .sampling import sample_random, sample_grid, test_grid

__all__ = ["sample_random", "sample_grid", "test_grid"]
