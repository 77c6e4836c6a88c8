package graft.functions

/** G7 — full-periodic-table element data and GENERATED μ/ρ grids.
  *
  * The reference accepts any element or compound at any energy via
  * `periodictable` (trx/utils/absorption.py:10-23); the hand-anchored
  * built-in set in [[ScatteringFunctions.Elements]] covers 29 elements.
  * This object closes the gap OUT OF THE BOX for Z = 1..92: atomic
  * weight, bulk density and absorption-edge energies (K, L1, L2, L3 —
  * standard x-ray data-booklet values, ~0.1%) are tabulated for every
  * element, and the μ/ρ grid for each non-anchored element is generated
  * from the anchored set by the same method round 15 established for
  * Na/Mg/P (cross-Z power law at constant energy) generalized to edge
  * regions:
  *
  *  - the 5-30 keV window is split per element into three REGIONS by its
  *    own edges — above-K, L (L3 ≤ E < K), M (E < L3);
  *  - at each grid energy the photoelectric part (total minus a
  *    Compton/coherent baseline scaled from the hydrogen anchor by Z/A)
  *    is interpolated log-log in Z between the nearest anchors in the
  *    SAME region (per-atom, ln(pe·A) vs ln Z); one-sided gaps
  *    extrapolate with the slope of the two nearest same-side anchors
  *    (clamped to [3, 7], default 4.4 — the textbook σ_pe ∝ Z^4.4);
  *  - fixed-energy cross-Z interpolation is only valid while the
  *    anchors' edges sit at similar reduced positions, so in the L and
  *    M regions anchor use is capped at 12 Z; across the wide 50..74
  *    L-region gap the anchors are instead evaluated EDGE-ALIGNED, at
  *    the same reduced position u = E/L3 of their own L branch (the
  *    edge sweep cancels; the residual per-atom trend at fixed u is
  *    mildly negative, Ag↔Sn↔W measure ≈ Z^-2.5);
  *  - K and L3 edge discontinuities inside the grid become two-sided
  *    table points: both sides from their own region's anchors when
  *    available, else the anchor-implied jump ratios
  *    (r_K(Z) = 2.54 + 152.8/Z fitted on the Fe..Sn anchors;
  *    r_L3(Z) = 2.40 + 0.0023·(Z−56); L1 1.16, L2 1.4); regions with
  *    no in-range anchor fill by E^-2.75 continuation from the edge;
  *  - L1/L2 sub-edges get centered two-sided splits (±√r around the
  *    smooth L-region curve).
  *
  * THE Ba/Ce ADJUDICATION (round 18). The long-carried Ba and Ce
  * anchor tables were INTERNALLY INCONSISTENT with the rest of the
  * anchor set: with both elements fully L-absorbing (e.g. 6 keV, all
  * L edges below E, K far above), per-atom photoelectric cross-section
  * cannot FALL 1.5x while Z rises 50→56, yet Sn(6 keV)=521 · A = 61.9k
  * vs the old Ba 294 · A = 40.4k did exactly that — and the certain
  * anchors on either side of the L sweep (Ag@10 = 118.2, W@10/15/30 =
  * 96.9/139.5/22.7, both standard published values) bracket a smooth
  * edge-aligned law (σ·A ≈ Z^-2.5 at fixed E/L3) that Mo/Ag/Sn fit and
  * Ba/Ce sit a uniform ~2.5x BELOW (the old Ce table is 0.40x of the
  * law at every grid point — a constant factor, i.e. a data fault, not
  * physics). Three independent routes (K-edge-continuity from Sn's
  * anchored K jump, E-power scaling from the certain W values, and the
  * aligned interpolation itself) agree on the corrected values within
  * ~10%, so Ba and Ce are now GENERATED from the consistent family —
  * e.g. Ce@10 keV ≈ 210 (was 84.84), Ce@30 ≈ 13.2 (was 4.24; the
  * K-continuity route gives 13.0). The old values are preserved here
  * for the record: Ce (6, 8, 10, 15, 20, 30 keV) = 305/151.8/84.84/
  * 28.33/12.97/4.242; Ba (5..30) = 123/294/135.2/74/24.8/11.4/3.81.
  *
  * Accuracy, stated honestly (leave-one-out measured in ExtrasSpec):
  * ~0.5-5% where anchors bracket closely — Z ≤ 50 above the K edge and
  * 74 ≤ Z ≤ 82 at all grid energies, the actinide M region (U@10 keV
  * reproduces the published 179 cm²/g within ~2%), and now the full
  * sub-K corridor Z = 23..50 plus the lanthanide L region via the
  * edge-aligned path (leave-one-out Sn lands within ~3% from the
  * Ag/W bracket); the weakest spots are within ~1 keV of an L sub-edge
  * (±20%) and the far below-L3 band of Cs..Nd at 5-6 keV (edge-jump
  * fills, ±30%). Edge-critical work (XANES-adjacent energies) should
  * load a measured table via
  * [[ScatteringFunctions.loadElementOverrides]] — overrides win over
  * both the anchored and the generated tables.
  */
private[graft] object ElementTable {

  /** Symbol, Z, atomic weight, bulk density (None for gases/unknown),
    * K/L1/L2/L3 edge energies in keV (0.0 = far below the 5-30 grid,
    * where the exact value cannot affect region classification).
    */
  final case class Datum(symbol: String, z: Int, weight: Double,
                         density: Option[Double],
                         k: Double, l1: Double, l2: Double, l3: Double)

  private def d(sym: String, z: Int, w: Double, rho: Double,
                k: Double, l1: Double = 0.0, l2: Double = 0.0,
                l3: Double = 0.0): Datum =
    Datum(sym, z, w, if (rho > 0) Some(rho) else None, k, l1, l2, l3)

  /** Z = 1..92. Edges above ~120 keV (He..B K) entered as their real
    * sub-keV values or 0 — both far below the grid.
    */
  val data: Seq[Datum] = Seq(
    d("H", 1, 1.008, 0, 0.0136), d("He", 2, 4.0026, 0, 0.025),
    d("Li", 3, 6.94, 0.534, 0.055), d("Be", 4, 9.0122, 1.848, 0.111),
    d("B", 5, 10.811, 2.34, 0.188), d("C", 6, 12.011, 2.267, 0.284),
    d("N", 7, 14.007, 0, 0.410), d("O", 8, 15.999, 0, 0.543),
    d("F", 9, 18.998, 0, 0.697), d("Ne", 10, 20.180, 0, 0.870),
    d("Na", 11, 22.990, 0.971, 1.071), d("Mg", 12, 24.305, 1.738, 1.303),
    d("Al", 13, 26.982, 2.70, 1.560), d("Si", 14, 28.085, 2.33, 1.839),
    d("P", 15, 30.974, 1.823, 2.146), d("S", 16, 32.06, 2.067, 2.472),
    d("Cl", 17, 35.45, 0, 2.822), d("Ar", 18, 39.948, 0, 3.206),
    d("K", 19, 39.098, 0.862, 3.608), d("Ca", 20, 40.078, 1.55, 4.039),
    d("Sc", 21, 44.956, 2.985, 4.492), d("Ti", 22, 47.867, 4.506, 4.966),
    d("V", 23, 50.942, 6.11, 5.465, 0, 0, 0.512), d("Cr", 24, 51.996, 7.19, 5.989, 0, 0, 0.574),
    d("Mn", 25, 54.938, 7.26, 6.539, 0, 0, 0.639), d("Fe", 26, 55.845, 7.874, 7.112, 0, 0, 0.707),
    d("Co", 27, 58.933, 8.90, 7.709, 0, 0, 0.778), d("Ni", 28, 58.693, 8.908, 8.333, 0, 0, 0.853),
    d("Cu", 29, 63.546, 8.96, 8.979, 0, 0, 0.933), d("Zn", 30, 65.38, 7.134, 9.659, 0, 0, 1.022),
    d("Ga", 31, 69.723, 5.904, 10.367, 0, 0, 1.115), d("Ge", 32, 72.63, 5.323, 11.103, 0, 0, 1.217),
    d("As", 33, 74.922, 5.727, 11.867, 0, 0, 1.324), d("Se", 34, 78.971, 4.81, 12.658, 0, 0, 1.434),
    d("Br", 35, 79.904, 3.12, 13.474, 0, 0, 1.55), d("Kr", 36, 83.798, 0, 14.326, 0, 0, 1.675),
    d("Rb", 37, 85.468, 1.532, 15.200, 0, 0, 1.805), d("Sr", 38, 87.62, 2.64, 16.105, 0, 0, 1.94),
    d("Y", 39, 88.906, 4.472, 17.038, 0, 0, 2.08), d("Zr", 40, 91.224, 6.52, 17.998, 0, 0, 2.223),
    d("Nb", 41, 92.906, 8.57, 18.986, 0, 0, 2.371), d("Mo", 42, 95.95, 10.22, 20.000, 0, 0, 2.52),
    d("Tc", 43, 98.0, 11.5, 21.044, 0, 0, 2.677), d("Ru", 44, 101.07, 12.37, 22.117, 0, 0, 2.838),
    d("Rh", 45, 102.906, 12.41, 23.220, 0, 0, 3.004), d("Pd", 46, 106.42, 12.02, 24.350, 0, 0, 3.173),
    d("Ag", 47, 107.868, 10.49, 25.514, 0, 0, 3.351), d("Cd", 48, 112.414, 8.65, 26.711, 0, 0, 3.538),
    d("In", 49, 114.818, 7.31, 27.940, 0, 0, 3.73), d("Sn", 50, 118.710, 7.287, 29.200,
      4.465, 4.156, 3.929),
    d("Sb", 51, 121.760, 6.697, 30.491, 4.698, 4.380, 4.132),
    d("Te", 52, 127.60, 6.24, 31.814, 4.939, 4.612, 4.341),
    d("I", 53, 126.904, 4.93, 33.169, 5.188, 4.852, 4.557),
    d("Xe", 54, 131.293, 0, 34.561, 5.453, 5.107, 4.786),
    d("Cs", 55, 132.905, 1.873, 35.985, 5.714, 5.359, 5.012),
    d("Ba", 56, 137.327, 3.51, 37.441, 5.989, 5.624, 5.247),
    d("La", 57, 138.905, 6.145, 38.925, 6.266, 5.891, 5.483),
    d("Ce", 58, 140.116, 6.77, 40.443, 6.548, 6.164, 5.723),
    d("Pr", 59, 140.908, 6.773, 41.991, 6.835, 6.440, 5.964),
    d("Nd", 60, 144.242, 7.007, 43.569, 7.126, 6.722, 6.208),
    d("Pm", 61, 145.0, 7.26, 45.184, 7.428, 7.013, 6.459),
    d("Sm", 62, 150.36, 7.52, 46.834, 7.737, 7.312, 6.716),
    d("Eu", 63, 151.964, 5.243, 48.519, 8.052, 7.617, 6.977),
    d("Gd", 64, 157.25, 7.895, 50.239, 8.376, 7.930, 7.243),
    d("Tb", 65, 158.925, 8.229, 51.996, 8.708, 8.252, 7.514),
    d("Dy", 66, 162.500, 8.55, 53.789, 9.046, 8.581, 7.790),
    d("Ho", 67, 164.930, 8.795, 55.618, 9.394, 8.918, 8.071),
    d("Er", 68, 167.259, 9.066, 57.486, 9.751, 9.264, 8.358),
    d("Tm", 69, 168.934, 9.321, 59.390, 10.116, 9.617, 8.648),
    d("Yb", 70, 173.045, 6.965, 61.332, 10.486, 9.978, 8.944),
    d("Lu", 71, 174.967, 9.84, 63.314, 10.870, 10.349, 9.244),
    d("Hf", 72, 178.49, 13.31, 65.351, 11.271, 10.739, 9.561),
    d("Ta", 73, 180.948, 16.654, 67.416, 11.682, 11.136, 9.881),
    d("W", 74, 183.84, 19.25, 69.525, 12.100, 11.544, 10.207),
    d("Re", 75, 186.207, 21.02, 71.676, 12.527, 11.959, 10.535),
    d("Os", 76, 190.23, 22.57, 73.871, 12.968, 12.385, 10.871),
    d("Ir", 77, 192.217, 22.42, 76.111, 13.419, 12.824, 11.215),
    d("Pt", 78, 195.08, 21.45, 78.395, 13.880, 13.273, 11.564),
    d("Au", 79, 196.97, 19.30, 80.725, 14.353, 13.734, 11.919),
    d("Hg", 80, 200.592, 13.546, 83.102, 14.839, 14.209, 12.284),
    d("Tl", 81, 204.383, 11.85, 85.530, 15.347, 14.698, 12.658),
    d("Pb", 82, 207.2, 11.35, 88.005, 15.861, 15.200, 13.035),
    d("Bi", 83, 208.980, 9.747, 90.526, 16.388, 15.711, 13.419),
    d("Po", 84, 209.0, 9.32, 93.105, 16.939, 16.244, 13.814),
    d("At", 85, 210.0, 0, 95.730, 17.493, 16.785, 14.214),
    d("Rn", 86, 222.0, 0, 98.404, 18.049, 17.337, 14.619),
    d("Fr", 87, 223.0, 0, 101.137, 18.639, 17.907, 15.031),
    d("Ra", 88, 226.0, 5.5, 103.922, 19.237, 18.484, 15.444),
    d("Ac", 89, 227.0, 10.07, 106.755, 19.840, 19.083, 15.871),
    d("Th", 90, 232.038, 11.72, 109.651, 20.472, 19.693, 16.300),
    d("Pa", 91, 231.036, 15.37, 112.601, 21.105, 20.314, 16.733),
    d("U", 92, 238.029, 19.05, 115.606, 21.757, 20.948, 17.166))

  val bySymbol: Map[String, Datum] = data.map(x => x.symbol -> x).toMap

  private val Base = Seq(5.0, 6.0, 8.0, 10.0, 15.0, 20.0, 30.0)

  /** Region at energy e under element d's own edges: 0 = above K,
    * 1 = L (L3 ≤ e < K), 2 = M (e < L3).
    */
  private def region(d: Datum, e: Double): Int =
    if (e >= d.k) 0 else if (e >= d.l3) 1 else 2

  /** Driver-side twin of ScatteringFunctions.interpolateMu: piecewise
    * linear in E⁻³, clamped to the grid endpoints.
    */
  private def muAt(grid: Seq[(Double, Double)], e: Double): Double = {
    if (e <= grid.head._1) return grid.head._2
    if (e >= grid.last._1) return grid.last._2
    val i = grid.lastIndexWhere(_._1 <= e)
    val (e1, m1) = grid(i); val (e2, m2) = grid(i + 1)
    def x(v: Double) = 1.0 / (v * v * v)
    m1 + (x(e) - x(e1)) * (m2 - m1) / (x(e2) - x(e1))
  }

  private def rK(z: Int): Double = 2.54 + 152.8 / z
  private def rL3(z: Int): Double = 2.40 + 0.0023 * (z - 56)

  /** Generate μ/ρ grids for every element of [[data]] that has no grid in
    * `anchors` (or is in `exclude` — the leave-one-out measurement hook).
    * Returns symbol → ElementInfo with the generated ascending grid.
    */
  def generate(anchors: Map[String, ScatteringFunctions.ElementInfo],
               exclude: Set[String] = Set.empty)
      : Map[String, ScatteringFunctions.ElementInfo] = {
    // hydrogen's μ/ρ ≥ 5 keV is (coherent+Compton)-only: the scattering
    // baseline per unit Z/A every pe split below subtracts
    val hMu = anchors("H").mu
    def scatUnit(e: Double) = muAt(hMu, e) / (1.0 / 1.008)
    // anchor grid value power-law extended a little past the grid ends
    // (exponent from the end pair, clamped) — edge-aligned evaluation
    // can land slightly outside [5, 30]
    def muAtExt(grid: Seq[(Double, Double)], e: Double): Double = {
      def ex(p1: (Double, Double), p2: (Double, Double)) =
        math.max(1.5, math.min(3.2,
          math.log(p1._2 / p2._2) / math.log(p2._1 / p1._1)))
      if (e < grid.head._1)
        grid.head._2 * math.pow(e / grid.head._1, -ex(grid(0), grid(1)))
      else if (e > grid.last._1)
        grid.last._2 * math.pow(e / grid.last._1,
          -ex(grid(grid.length - 2), grid.last))
      else muAt(grid, e)
    }
    final case class Anchor(d: Datum, grid: Seq[(Double, Double)]) {
      // per-atom ln photoelectric cross-section proxy at e
      def y(e: Double): Double = {
        val pe = math.max(muAtExt(grid, e) - scatUnit(e) * d.z / d.weight,
          1e-6)
        math.log(pe * d.weight)
      }
      def usableAt(e: Double): Boolean =
        e >= grid.head._1 - 1e-9 && e <= grid.last._1 + 1e-9
    }
    val anchorSeq = (anchors -- exclude - "H").toSeq.flatMap {
      case (sym, info) => bySymbol.get(sym).map(Anchor(_, info.mu))
    }.sortBy(_.d.z)

    // Z-gap cap for fixed-energy use in the edge-sweep regions (L/M):
    // at fixed E the per-atom pe is smooth in Z only while the anchors'
    // edges sit at similar reduced positions — beyond ~12 Z the L/M
    // edges have swept far enough that fixed-E inter/extrapolation is
    // systematically biased (the Ba/Ce lesson below)
    val MaxZGap = 12

    def estimate(t: Datum, e: Double): Option[Double] = {
      val r = region(t, e)
      def withScat(peA: Double): Double =
        peA / t.weight + scatUnit(e) * t.z / t.weight
      def interp(below: Seq[Anchor], above: Seq[Anchor],
                 yOf: Anchor => Double,
                 oneSided: Seq[Anchor] => Double): Option[Double] =
        (below.lastOption, above.headOption) match {
          case (Some(lo), Some(hi)) =>
            val f = math.log(t.z.toDouble / lo.d.z) /
              math.log(hi.d.z.toDouble / lo.d.z)
            Some(withScat(math.exp(yOf(lo) + f * (yOf(hi) - yOf(lo)))))
          case (Some(lo), None) =>
            Some(withScat(math.exp(yOf(lo) +
              oneSided(below.takeRight(2)) *
                math.log(t.z.toDouble / lo.d.z))))
          case (None, Some(hi)) =>
            Some(withScat(math.exp(yOf(hi) +
              oneSided(above.take(2)) * math.log(t.z.toDouble / hi.d.z))))
          case _ => None
        }

      def fixedE(maxGap: Int): Option[Double] = {
        val in = anchorSeq.filter(a => region(a.d, e) == r &&
          a.usableAt(e) && math.abs(a.d.z - t.z) <= maxGap)
        def slope(two: Seq[Anchor]): Double =
          if (two.length < 2) 4.4
          else {
            val Seq(a, b) = two.sortBy(_.d.z)
            math.max(3.0, math.min(7.0,
              (b.y(e) - a.y(e)) / math.log(b.d.z.toDouble / a.d.z)))
          }
        interp(in.filter(_.d.z < t.z), in.filter(_.d.z > t.z),
          _.y(e), slope)
      }

      // edge-aligned L-region estimate: each anchor evaluated at the
      // SAME reduced position u = E/L3 of its OWN L branch, so the
      // L-edge sweep across Z cancels; the residual per-atom Z trend at
      // fixed u is mildly NEGATIVE (lower edges -> larger sigma at the
      // aligned energy outweighs shell filling; Ag<->Sn<->W measure
      // ~Z^-2.5)
      def aligned(): Option[Double] = {
        if (t.l3 <= 0) return None
        val u = e / t.l3
        val in = anchorSeq.filter { a =>
          a.d.l3 > 0 && math.abs(a.d.z - t.z) <= 27 && {
            val eA = u * a.d.l3
            region(a.d, eA) == 1 &&
              eA >= a.grid.head._1 * 0.75 && eA <= a.grid.last._1 * 1.35
          }
        }
        def yA(a: Anchor) = a.y(u * a.d.l3)
        def slope(two: Seq[Anchor]): Double =
          if (two.length < 2) -2.5
          else {
            val Seq(a, b) = two.sortBy(_.d.z)
            math.max(-5.0, math.min(-0.3,
              (yA(b) - yA(a)) / math.log(b.d.z.toDouble / a.d.z)))
          }
        interp(in.filter(_.d.z < t.z), in.filter(_.d.z > t.z), yA, slope)
      }

      r match {
        case 0 => fixedE(Int.MaxValue) // K branch: smooth in Z at fixed E
        case 1 => fixedE(MaxZGap).orElse(aligned())
        case _ => fixedE(MaxZGap) // M: short-range only; else edge fill
      }
    }

    def gridFor(t: Datum): Seq[(Double, Double)] = {
      val resolved = scala.collection.mutable.Map.empty[Double, Double]
      Base.foreach(e => estimate(t, e).foreach(resolved(e) = _))
      // per-region power-law exponent from the resolved points
      def expo(r: Int): Double = {
        val pts = resolved.toSeq.filter(p => region(t, p._1) == r).sortBy(_._1)
        if (pts.length < 2) 2.75
        else {
          val (e1, m1) = pts.head; val (e2, m2) = pts.last
          math.max(1.5, math.min(3.2,
            math.log(m1 / m2) / math.log(e2 / e1)))
        }
      }
      // continuation of region r to energy e from its nearest resolved pt
      def continue(r: Int, e: Double): Option[Double] = {
        val pts = resolved.toSeq.filter(p => region(t, p._1) == r)
        pts.minByOption(p => math.abs(math.log(p._1 / e))).map {
          case (e0, m0) => m0 * math.pow(e / e0, -expo(r)) }
      }
      // region-boundary edges inside the grid, top-down (K first): fill
      // two-sided points and, when the lower region has no anchors at
      // all, its base energies by jump + power-law continuation
      val edgePts = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      val bounds = Seq((t.k, 0, rK(t.z)), (t.l3, 1, rL3(t.z)))
      bounds.foreach { case (eStar, rAbove, jump) =>
        if (eStar > 5.005 && eStar < 29.98) {
          val rBelow = rAbove + 1
          val above = continue(rAbove, eStar)
            .orElse(estimate(t, eStar + 0.001))
          val below0 = estimate(t, eStar - 0.001)
            .orElse(continue(rBelow, eStar))
          above.foreach { av =>
            val bv0 = below0.getOrElse(av / jump)
            val bv = math.min(bv0, av / 1.05) // edges never invert
            edgePts += ((eStar + 0.001, av), (eStar - 0.001, bv))
            // fill an anchorless region below from its edge value
            val holes = Base.filter(e => region(t, e) == rBelow &&
              !resolved.contains(e))
            if (!resolved.keys.exists(e => region(t, e) == rBelow))
              holes.foreach(e => resolved(e) = bv * math.pow(e / eStar, -2.75))
          }
        }
      }
      // remaining unresolved base energies: continue within region
      Base.filterNot(resolved.contains).foreach { e =>
        continue(region(t, e), e).foreach(resolved(e) = _)
      }
      // L1/L2 sub-edges: centered two-sided splits on the smooth curve
      Seq((t.l1, 1.16), (t.l2, 1.4)).foreach { case (eStar, r) =>
        if (eStar > 5.005 && eStar < 29.98) {
          val s = continue(1, eStar).orElse(estimate(t, eStar))
          s.foreach { sm =>
            val h = math.sqrt(r)
            edgePts += ((eStar + 0.001, sm * h), (eStar - 0.001, sm / h))
          }
        }
      }
      val all = (resolved.toSeq ++ edgePts).sortBy(_._1)
        .map { case (e, m) =>
          (math.rint(e * 1000) / 1000,
            BigDecimal(m).round(new java.math.MathContext(4)).toDouble) }
      require(all.nonEmpty && all.forall(_._2 > 0),
        s"element table generation failed for ${t.symbol}")
      all
    }

    data.filter(t => !(anchors -- exclude).contains(t.symbol))
      .map(t => t.symbol ->
        ScatteringFunctions.ElementInfo(t.weight, t.density, gridFor(t)))
      .toMap
  }
}
