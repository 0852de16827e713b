from .benchmarker import Benchmarker
from .step_tracker import StepTracker
