"""Machine-learning utilities: PCA, SVM, KNN (reference base/ml/)."""
from . import pca, svm, knn  # noqa: F401
