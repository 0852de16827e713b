from . import api, projection, reference, tiling, composite
