package graft.algo
import breeze.linalg._
// scratch search main (deleted before commit)
object QpSearchMain {
  def main(args: Array[String]): Unit = {
    for (seed <- 1 to 6; ridge <- Seq(1e-4, 1e-6, 1e-8, 1e-10); lambda <- Seq(50.0, 2000.0, 1e5)) {
      val rnd = new scala.util.Random(seed)
      val n = 80
      val a = DenseMatrix.tabulate(n, 3)((_, _) => rnd.nextGaussian() * 0.05)
      val sigma = a * a.t + DenseMatrix.eye[Double](n) * ridge
      val alphas = DenseVector.tabulate(n)(_ => rnd.nextGaussian() * 0.01)
      val d = Qp.solveDiag(alphas, sigma, lambda)
      if (d.plateaued || !d.converged)
        println(f"HIT seed=$seed ridge=$ridge%.0e lambda=$lambda%.0e iters=${d.iters} conv=${d.converged} plat=${d.plateaued} gap=${d.gap}%.3e warned=${d.warned}")
    }
    println("SEARCH_DONE")
  }
}
