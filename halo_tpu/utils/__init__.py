from .metrics import (intersection_and_union, miou_from_histograms, miou_star)
