"""Classical-estimator benchmark over known-ID datasets
(rebuild of /root/reference/run_benchmark.py + benchmark.py CLI).

Usage: python scripts/run_benchmark.py --out results.csv
"""
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("out", "benchmark_results.csv", "Output CSV")
flags.DEFINE_integer("samples", 2000, "Points per dataset")


def main(argv):
    del argv
    from iddiff.analysis import Benchmark
    from iddiff.data.ksphere import generate_ksphere
    from iddiff.data.line import generate_line
    from iddiff.data.mammoth import generate_mammoth

    n = FLAGS.samples
    datasets = {
        "ksphere_10": generate_ksphere(
            n_samples=n, n_spheres=1, ambient_dim=100, manifold_dim=10,
            noise_std=0.0, embedding_type="random_isometry",
        ),
        "ksphere_50": generate_ksphere(
            n_samples=n, n_spheres=1, ambient_dim=100, manifold_dim=50,
            noise_std=0.0, embedding_type="random_isometry",
        ),
        "line": generate_line(ambient_dim=100, n_samples=n),
        "mammoth": generate_mammoth(ambient_dim=100,
                                    embedding_type="random_isometry"),
    }
    path = Benchmark(FLAGS.out).run(datasets, max_points=n)
    print(f"wrote {path}")
    with open(path) as f:
        print(f.read())


if __name__ == "__main__":
    app.run(main)
