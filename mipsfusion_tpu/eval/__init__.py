from .ate import evaluate_ate, pose_evaluation, align_horn  # noqa: F401
